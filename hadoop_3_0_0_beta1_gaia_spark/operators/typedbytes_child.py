"""Reference child process for typedbytes-mode pipes (``-io typedbytes``).

Plays the role of the user's streaming executable in hadoop-streaming's
typedbytes mode (hadoop-tools/hadoop-streaming/.../typedbytes/
TypedBytesInput.java framing, io/IdentifierResolver.java:36-37): reads one
base64-wrapped typedbytes (key, value) frame per stdin line, applies an op,
writes one frame per stdout line. Ops:

    identity   emit records unchanged
    scale2     emit (key, value * 2) — value must be numeric
    swap       emit (value, key)

Invoked as ``python typedbytes_child.py <op>`` by ``pipe_df(io="typedbytes")``;
self-locates the package so executors need no PYTHONPATH setup in local mode
(at cluster scale, ship the package zip via --py-files as usual).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from hadoop_3_0_0_beta1_gaia_spark.operators.typedbytes import (  # noqa: E402
    dumps_b64,
    loads_b64,
)


def main() -> None:
    op = sys.argv[1] if len(sys.argv) > 1 else "identity"
    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        key, value = loads_b64(line)
        if op == "identity":
            pass
        elif op == "scale2":
            value = value * 2
        elif op == "swap":
            key, value = value, key
        else:
            raise SystemExit(f"unknown op {op!r}")
        sys.stdout.write(dumps_b64(key, value))
        sys.stdout.write("\n")


if __name__ == "__main__":
    main()
