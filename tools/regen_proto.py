"""Regenerate *_pb2.py from the .proto schemas.

Parity: /root/reference/tools/regen_proto.py (the reference builds its
generated code at Docker time; here the generated modules are committed so
the package is importable without a build step).

Usage: python tools/regen_proto.py
"""

from __future__ import annotations

import pathlib
import re
import subprocess
import sys

PROTO_DIR = pathlib.Path(__file__).resolve().parent.parent / "spectralmc_tpu" / "proto"


def main() -> int:
    protos = sorted(PROTO_DIR.glob("*.proto"))
    if not protos:
        print("no .proto files found", file=sys.stderr)
        return 1
    subprocess.run(
        ["protoc", f"-I{PROTO_DIR}", f"--python_out={PROTO_DIR}", *map(str, protos)],
        check=True,
    )
    # protoc emits absolute imports (import common_pb2); rewrite to relative so
    # the modules work inside the package without sys.path games.
    for pb2 in PROTO_DIR.glob("*_pb2.py"):
        text = pb2.read_text()
        fixed = re.sub(
            r"^import (\w+_pb2) as (\w+)$",
            r"from spectralmc_tpu.proto import \1 as \2",
            text,
            flags=re.MULTILINE,
        )
        pb2.write_text(fixed)
    print(f"regenerated {len(protos)} schemas into {PROTO_DIR}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
