"""One sweep artifact per round (r8 judge ask — six SWEEP_* files
that round): runs scripts/sweep_scale.py at each given scale point
and merges the per-entry outcomes into a single SWEEP_r{N}.json
keyed by entry -> {sf: status}, plus the per-SF summaries.

RESUMABLE (r11 verdict item 1): each scale point checkpoints its
per-entry results to SWEEP_r{N}_{label}.progress.jsonl as it goes,
and every invocation passes --resume — re-running this script after
a budget overrun (or a fix) carries completed entries over and only
runs what is missing, so one overrun costs the tail of one scale
point, never the whole pass. Delete the progress file to force a
fresh run of that scale point.

Usage: python scripts/sweep_round.py <round> <sf_dir> [<sf_dir> ...]
e.g.:  python scripts/sweep_round.py 9 /tmp/sf1 /tmp/sf10
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    rnd = sys.argv[1]
    sf_dirs = sys.argv[2:]
    assert sf_dirs, "pass at least one sf_dir"

    per_sf: dict[str, dict] = {}
    entries: dict[str, dict] = {}
    failed_any = False
    for sf_dir in sf_dirs:
        label = os.path.basename(sf_dir.rstrip("/"))
        progress = os.path.join(
            HERE, "..", f"SWEEP_r{rnd}_{label}.progress.jsonl")
        proc = subprocess.run(
            [sys.executable, os.path.join(HERE, "sweep_scale.py"),
             sf_dir, "--progress", progress, "--resume"],
            capture_output=True, text=True, check=False)
        sys.stderr.write(proc.stderr)
        lines = [ln for ln in proc.stdout.splitlines()
                 if ln.startswith("{")]
        if not lines:
            # child crashed before printing its JSON line: surface ITS
            # diagnosis, not an IndexError traceback from here. The
            # progress file keeps what completed — rerun to resume.
            sys.stderr.write(
                f"sweep_scale.py produced no JSON for {sf_dir} "
                f"(rc={proc.returncode}); stderr above is the real "
                f"failure. Completed entries are checkpointed in "
                f"{os.path.normpath(progress)} — rerun this script "
                f"to resume.\n")
            sys.exit(proc.returncode or 1)
        res = json.loads(lines[-1])
        detail = res.pop("detail", {})
        per_sf[label] = res
        failed_any = failed_any or res["n_failed"] > 0
        for name, d in detail.items():
            entries.setdefault(name, {})[label] = d["status"]

    out = {"round": rnd, "scale_points": list(per_sf),
           "summaries": per_sf, "entries": entries}
    path = os.path.join(HERE, "..", f"SWEEP_r{rnd}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {os.path.normpath(path)}; "
          f"failed_any={failed_any}")
    sys.exit(1 if failed_any else 0)


if __name__ == "__main__":
    main()
