"""Command-line frontend.

Capability parity with /root/reference/cli/src/main.rs (compress/decompress
subcommands, levels 0-4 mapping, output-name derivation, ratio/throughput
summaries) and cli/src/progress.rs (periodic progress + final summary).

    python -m zstd_tpu.cli compress   <input> [output] -l 1 [--tpu]
    python -m zstd_tpu.cli decompress <input> [output] [--tpu]
    python -m zstd_tpu.cli train-dict <dir> -o dict.bin --size 112640
"""

import argparse
import io
import os
import sys
import time

from zstd_tpu.common.config import CompressionLevel

_LEVELS = {
    0: CompressionLevel.UNCOMPRESSED,
    1: CompressionLevel.FASTEST,
    2: CompressionLevel.DEFAULT,
    3: CompressionLevel.BETTER,
    4: CompressionLevel.BEST,
}


def _progress(done: int, total: int, t0: float) -> None:
    dt = max(time.time() - t0, 1e-9)
    pct = 100.0 * done / total if total else 100.0
    sys.stderr.write(f"\r{pct:5.1f}%  {done / 1e6:8.1f} MB  "
                     f"{done / dt / 1e6:7.1f} MB/s")
    sys.stderr.flush()


def cmd_compress(args) -> int:
    out_path = args.output or args.input + ".zst"
    with open(args.input, "rb") as f:
        data = f.read()
    t0 = time.time()
    level = _LEVELS[args.level]
    if getattr(args, "tpu", False):
        from zstd_tpu.common.config import CodecConfig
        from zstd_tpu.encoding.device_matcher import DeviceMatcher
        from zstd_tpu.models.batch_encoder import BatchEncoder

        enc = BatchEncoder(CodecConfig(level=level), matcher=DeviceMatcher())
        (z,) = enc.compress_frames([data])
    else:
        from zstd_tpu.encoding.frame_enc import compress_to_vec

        z = compress_to_vec(data, level)
    dt = time.time() - t0
    with open(out_path, "wb") as f:
        f.write(z)
    ratio = len(z) / max(1, len(data))
    sys.stderr.write(
        f"{args.input}: {len(data)} -> {len(z)} bytes "
        f"(ratio {ratio:.3f}) in {dt:.2f}s ({len(data) / max(dt, 1e-9) / 1e6:.1f} MB/s)"
        f" -> {out_path}\n")
    return 0


def cmd_decompress(args) -> int:
    out_path = args.output
    if out_path is None:
        out_path = (args.input[:-4] if args.input.endswith(".zst")
                    else args.input + ".out")
    with open(args.input, "rb") as f:
        data = f.read()
    t0 = time.time()
    if args.tpu:
        from zstd_tpu.models.splitter import decode_all_device

        out = decode_all_device(data)
    else:
        from zstd_tpu.oracle import decode_all

        out = decode_all(data)
    dt = time.time() - t0
    with open(out_path, "wb") as f:
        f.write(out)
    sys.stderr.write(
        f"{args.input}: {len(data)} -> {len(out)} bytes in {dt:.2f}s "
        f"({len(out) / max(dt, 1e-9) / 1e6:.1f} MB/s) -> {out_path}\n")
    return 0


def cmd_train_dict(args) -> int:
    from zstd_tpu.models.dict_trainer import DictParams, create_raw_dict_from_dir

    d = create_raw_dict_from_dir(args.input, DictParams(dict_size=args.size))
    with open(args.output, "wb") as f:
        f.write(d)
    sys.stderr.write(f"trained {len(d)}-byte raw dictionary -> {args.output}\n")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="zstd_tpu", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("compress", help="compress a file")
    c.add_argument("input")
    c.add_argument("output", nargs="?")
    c.add_argument("-l", "--level", type=int, default=1, choices=sorted(_LEVELS))
    c.add_argument("--tpu", action="store_true",
                   help="device match finding + batched entropy coding")
    c.set_defaults(fn=cmd_compress)

    d = sub.add_parser("decompress", help="decompress a file")
    d.add_argument("input")
    d.add_argument("output", nargs="?")
    d.add_argument("--tpu", action="store_true",
                   help="use the batched device pipeline")
    d.set_defaults(fn=cmd_decompress)

    t = sub.add_parser("train-dict", help="train a raw-content dictionary")
    t.add_argument("input", help="directory of sample files")
    t.add_argument("-o", "--output", required=True)
    t.add_argument("--size", type=int, default=112 * 1024)
    t.set_defaults(fn=cmd_train_dict)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
