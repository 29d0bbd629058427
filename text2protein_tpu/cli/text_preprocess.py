"""Offline caption-embedding cache builder —
`python -m text2protein_tpu.cli.text_preprocess <config> [--out id2emb.npz]`.

The reference's offline path (`/root/reference/text_preprocess.py:9-24`):
{pdb_id: caption} json -> per-id embedding cache. Promoted to the default
training path here (the reference re-embeds captions on CPU every step).
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("config", type=str)
    p.add_argument("--out", type=str, default="id2emb.npz")
    p.add_argument("--limit", type=int, default=None)
    args = p.parse_args(argv)

    from ..config import load_config
    from ..text import build_text_encoder, encode_captions

    config = load_config(args.config)
    with open(config.data.caption_path) as f:
        ann = json.load(f)
    if not isinstance(ann, dict):
        ann = {a["pdb_id"]: a["caption"] for a in ann}
    if args.limit:
        ann = dict(list(ann.items())[: args.limit])

    encoder = build_text_encoder(config)
    out = encode_captions(ann, encoder, args.out)
    print(f"wrote {len(ann)} caption embeddings to {out}")


if __name__ == "__main__":
    main()
