"""Download a HF model snapshot for conversion (reference: tools/download.py).

Skips alternative weight formats unless --all is given, so only config,
tokenizer, and .safetensors shards are fetched.

Usage: python tools/download.py <model-id> [dest] [--all]
"""

from __future__ import annotations

import argparse


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("model", help="HF hub id, e.g. mistralai/Mistral-7B-v0.1")
    ap.add_argument("dest", nargs="?", default=None)
    ap.add_argument("--all", action="store_true",
                    help="also fetch .bin/.pth/.gguf alternatives")
    args = ap.parse_args(argv)

    from huggingface_hub import snapshot_download

    ignore = None if args.all else ["*.bin", "*.pth", "*.gguf", "*.onnx*"]
    path = snapshot_download(repo_id=args.model, local_dir=args.dest,
                             ignore_patterns=ignore)
    print(path)


if __name__ == "__main__":
    main()
