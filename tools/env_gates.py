"""Re-probe the environment gates that park reference behaviors on
their fallback paths (VERDICT r5 'What's missing' #1/#2/#4):

1. spark-protobuf jar → `from_protobuf` decode path
   (tests/test_proto_tier1.py self-skips without it)
2. python `google.protobuf` → transformWithStateInPandas
   (streaming_queries.py:358 gate)
3. a reachable Kafka broker → live end-to-end ingest
   (tests/test_kafka_contract.py stops at data-source resolution)

Run once per round; SURVEY §2A notes the result either way.

Usage: python tools/env_gates.py
"""

from __future__ import annotations

import glob
import os
import socket
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def probe_protobuf_jar() -> str:
    import pyspark

    home = os.path.dirname(pyspark.__file__)
    hits = glob.glob(os.path.join(home, "jars", "*protobuf*"))
    spark_proto = [h for h in hits if "spark-protobuf" in os.path.basename(h)]
    if spark_proto:
        return f"PRESENT: {spark_proto}"
    return (
        f"ABSENT (pyspark jars dir has {len(hits)} protobuf-adjacent "
        f"jars, none spark-protobuf: "
        f"{[os.path.basename(h) for h in hits]})"
    )


def probe_google_protobuf() -> str:
    try:
        import google.protobuf as gp

        return f"PRESENT: {gp.__version__}"
    except ImportError as e:
        return f"ABSENT ({e})"


def probe_kafka_broker(host: str = "localhost", ports=(9092, 29092)) -> str:
    for port in ports:
        try:
            with socket.create_connection((host, port), timeout=1.0):
                return f"PRESENT: {host}:{port} accepts connections"
        except OSError:
            continue
    return f"ABSENT (no listener on {host}:{list(ports)})"


def main() -> None:
    print(f"spark-protobuf jar:  {probe_protobuf_jar()}")
    print(f"google.protobuf:     {probe_google_protobuf()}")
    print(f"kafka broker:        {probe_kafka_broker()}")


if __name__ == "__main__":
    main()
