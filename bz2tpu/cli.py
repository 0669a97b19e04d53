"""bz2tpu command-line tool.

Parity with the reference CLI (app.cpp:31-179): compress by default,
--dec / --check / --keep / --size 1-9 / --parallel N. Differences by design:
- input files are NOT deleted unless --rm is given (the reference deletes by
  default, app.cpp:119-121 — a footgun we do not replicate);
- --backend picks the engine: "tpu" (JAX pipeline, default when available)
  or "oracle" (pure NumPy reference codec);
- standard bzip2 block sizes (level N = N*100k), so output interoperates
  with stock bzip2 both ways.
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="bz2tpu",
        description="TPU-native bzip2 codec (JAX/XLA/Pallas)",
    )
    p.add_argument("file", help="input file ('-' for stdin->stdout)")
    p.add_argument("--dec", action="store_true", help="decompress")
    p.add_argument("--check", action="store_true", help="integrity check only (decode + CRC verify)")
    p.add_argument("--keep", action="store_true", default=True, help="keep input file (default)")
    p.add_argument("--rm", action="store_true", help="delete input file on success")
    p.add_argument("--size", type=int, default=9, metavar="1-9", help="block size level (N*100k bytes)")
    p.add_argument(
        "--parallel", type=int, default=0, metavar="N",
        help="blocks per device batch (0 = auto)",
    )
    p.add_argument("--backend", choices=["tpu", "oracle"], default="tpu")
    p.add_argument("-o", "--output", help="output path (default: input+.bz2 / strip .bz2)")
    p.add_argument("-v", "--verbose", action="store_true")
    return p


def _engine(backend: str, level: int, parallel: int):
    if backend == "oracle":
        from bz2tpu.oracle import compress, decompress

        return (lambda d: compress(d, level=level)), decompress
    from bz2tpu.runtime.compressor import compress as tpu_compress
    from bz2tpu.runtime.decompressor import decompress as tpu_decompress

    return (
        lambda d: tpu_compress(d, level=level, parallel=parallel or None),
        tpu_decompress,
    )


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if not 1 <= args.size <= 9:
        print("error: --size must be 1..9", file=sys.stderr)
        return 2

    compress, decompress = _engine(args.backend, args.size, args.parallel)

    use_stdio = args.file == "-"
    if use_stdio:
        data = sys.stdin.buffer.read()
    else:
        if not os.path.exists(args.file):
            print(f"error: no such file: {args.file}", file=sys.stderr)
            return 2
        with open(args.file, "rb") as f:
            data = f.read()

    t0 = time.perf_counter()
    try:
        if args.dec or args.check:
            result = decompress(data)
            if args.check:
                print("Integrity check passed!")
                return 0
            out_path = args.output or (
                args.file[:-4] if args.file.endswith(".bz2") else args.file + ".out"
            )
        else:
            result = compress(data)
            out_path = args.output or (args.file + ".bz2")
    except Exception as e:  # noqa: BLE001 — CLI boundary
        print(f"error: {e}", file=sys.stderr)
        return 1
    dt = time.perf_counter() - t0

    if use_stdio:
        sys.stdout.buffer.write(result)
    else:
        with open(out_path, "wb") as f:
            f.write(result)
    if args.verbose:
        mb = len(data) / 1e6
        print(
            f"{len(data)} -> {len(result)} bytes "
            f"({len(result) / max(len(data), 1):.3f}) in {dt:.3f}s "
            f"({mb / max(dt, 1e-9):.1f} MB/s)",
            file=sys.stderr,
        )
    if args.rm and not use_stdio:
        os.remove(args.file)
    return 0


if __name__ == "__main__":
    sys.exit(main())
