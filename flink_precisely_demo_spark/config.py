"""Job configuration plumbing (M2).

Mirrors the reference's property handling (Utils.java:17-30
``readKafkaProperties`` extracts keys by prefix from a properties
map; Utils.java:32-45 ``parseArgs`` merges ``key=value`` CLI args
over file-loaded defaults; consumed at StreamingJob.java:67,84-85
where Kafka client props are re-prefixed for the connector).

Spark-side the consumers are ``sources.kafka.kafka_options`` (adds
the connector's ``kafka.`` prefix) and plain ``.option()`` calls.
"""

from __future__ import annotations


def read_prefixed_properties(props: dict[str, str], prefix: str,
                             strip: bool = True) -> dict[str, str]:
    """Extract entries whose key starts with ``prefix`` (optionally
    stripping it) — readKafkaProperties parity."""
    out = {}
    for k, v in props.items():
        if k.startswith(prefix):
            out[k[len(prefix):] if strip else k] = v
    return out


def parse_args(argv: list[str], defaults: dict[str, str] | None = None
               ) -> dict[str, str]:
    """``key=value`` argument list merged over defaults — parseArgs
    parity. Later duplicates win; bare flags map to 'true'."""
    out = dict(defaults or {})
    for a in argv:
        if "=" in a:
            k, _, v = a.partition("=")
            out[k.strip()] = v.strip()
        elif a.strip():
            out[a.strip()] = "true"
    return out


def load_properties_file(path: str) -> dict[str, str]:
    """Minimal .properties reader (# comments, key=value lines)."""
    out: dict[str, str] = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith(("#", "!")):
                continue
            if "=" in line:
                k, _, v = line.partition("=")
                out[k.strip()] = v.strip()
    return out
