"""Reference child process for rawbytes-mode pipes (``-io rawbytes``).

Plays the role of the user's streaming executable in hadoop-streaming's
rawbytes mode (hadoop-tools/hadoop-streaming/.../io/IdentifierResolver.java:36-37,
RawBytes{Input,Output}Reader): reads one base64-wrapped length-prefixed
(key, value) byte frame per stdin line, applies an op on the RAW BYTES,
writes one frame per stdout line. Ops:

    identity   emit records unchanged
    upper      uppercase the value bytes (ASCII)
    swap       emit (value, key)
    xor1       flip the low bit of every value byte — yields non-UTF-8
               output, proving the transport is byte-clean, not text

Invoked as ``python rawbytes_child.py <op>`` by ``pipe_df(io="rawbytes")``.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from hadoop_3_0_0_beta1_gaia_spark.operators.pipe import (  # noqa: E402
    rawbytes_dumps,
    rawbytes_loads,
)


def main() -> None:
    op = sys.argv[1] if len(sys.argv) > 1 else "identity"
    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        key, value = rawbytes_loads(line)
        if op == "identity":
            pass
        elif op == "upper":
            value = value.upper()
        elif op == "swap":
            key, value = value, key
        elif op == "xor1":
            value = bytes(b ^ 1 for b in value)
        else:
            raise SystemExit(f"unknown op {op!r}")
        sys.stdout.write(rawbytes_dumps(key, value))
        sys.stdout.write("\n")


if __name__ == "__main__":
    main()
