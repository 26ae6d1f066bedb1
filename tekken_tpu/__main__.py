"""Command-line interface.

    python -m tekken_tpu encode  --model tekken.json [--bos] [--eos] TEXT...
    python -m tekken_tpu decode  --model tekken.json --policy keep ID...
    python -m tekken_tpu info    --model tekken.json
    python -m tekken_tpu validate --model tekken.json
    python -m tekken_tpu encode-file --model tekken.json FILE [--engine ...]

(The reference ships no CLI; this is a TPU-native extension.)
"""

from __future__ import annotations

import argparse
import json
import sys


def _load(model_path):
    from .tekkenizer import Tekkenizer
    return Tekkenizer.from_file(model_path)


def _policy(name: str):
    from .special_tokens import SpecialTokenPolicy
    return {"keep": SpecialTokenPolicy.KEEP,
            "ignore": SpecialTokenPolicy.IGNORE,
            "raise": SpecialTokenPolicy.RAISE}[name]


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="tekken-tpu", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    pe = sub.add_parser("encode", help="encode text arguments to token ids")
    pe.add_argument("--model", required=True)
    pe.add_argument("--bos", action="store_true")
    pe.add_argument("--eos", action="store_true")
    pe.add_argument("--engine", choices=["auto", "oracle", "device"],
                    default="auto")
    pe.add_argument("text", nargs="+")

    pd = sub.add_parser("decode", help="decode token ids to text")
    pd.add_argument("--model", required=True)
    pd.add_argument("--policy", choices=["keep", "ignore", "raise"],
                    default="ignore")
    pd.add_argument("ids", nargs="+", type=int)

    pi = sub.add_parser("info", help="print model metadata")
    pi.add_argument("--model", required=True)

    pv = sub.add_parser("validate", help="run model-file self checks")
    pv.add_argument("--model", required=True)

    pf = sub.add_parser("encode-file", help="encode a text file (one doc "
                        "per line) and print JSONL of id lists")
    pf.add_argument("--model", required=True)
    pf.add_argument("--engine", choices=["auto", "device", "native",
                                         "oracle"], default="auto")
    pf.add_argument("file")

    args = p.parse_args(argv)

    if args.cmd == "encode":
        tok = _load(args.model)
        if args.engine == "device":
            out = tok.encode_batch(args.text,
                                   add_beginning_of_sequence=args.bos,
                                   add_end_of_sequence=args.eos)
        else:
            out = [tok.encode(t, args.bos, args.eos) for t in args.text]
        for ids in out:
            print(json.dumps(ids))
        return 0

    if args.cmd == "decode":
        tok = _load(args.model)
        print(tok.decode(args.ids, _policy(args.policy)))
        return 0

    if args.cmd == "info":
        tok = _load(args.model)
        print(json.dumps({
            "vocab_size": tok.vocab_size(),
            "num_special_tokens": tok.num_special_tokens(),
            "version": tok.version().as_str(),
            "audio": tok.has_audio_support(),
            "bos_id": tok.bos_id(),
            "eos_id": tok.eos_id(),
        }, indent=2))
        return 0

    if args.cmd == "validate":
        import subprocess
        import os
        tool = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tools", "validate_model.py")
        if os.path.exists(tool):
            return subprocess.call([sys.executable, tool, args.model])
        # fall back to an inline check when tools/ isn't shipped
        tok = _load(args.model)
        ids = tok.encode("validation probe 123", True, True)
        from .special_tokens import SpecialTokenPolicy
        assert tok.decode(ids, SpecialTokenPolicy.IGNORE) == \
            "validation probe 123"
        print("VALIDATION OK")
        return 0

    if args.cmd == "encode-file":
        tok = _load(args.model)
        with open(args.file, encoding="utf-8") as f:
            lines = [ln.rstrip("\n") for ln in f]
        if args.engine == "native":
            from .native import NativeEncoder
            ne = NativeEncoder(tok)
            shift = tok.num_special_tokens()
            out = [[r + shift for r in ranks]
                   for ranks in ne.encode_batch(lines)]
        elif args.engine == "oracle":
            out = [tok.encode(ln, False, False) for ln in lines]
        else:
            out = tok.encode_batch(lines)
        for ids in out:
            print(json.dumps(ids))
        return 0

    return 2


if __name__ == "__main__":
    sys.exit(main())
