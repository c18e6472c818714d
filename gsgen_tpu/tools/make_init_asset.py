"""Precompute generative-init point-cloud assets.

The init pipeline treats text->3D priors as one-shot data (reference
utils/initialize.py semantics): clouds live at
``$GSGEN_ASSET_DIR/{point_e,shap_e}_<md5(prompt)[:16]>.npz``.  This CLI
runs the in-process samplers (gsgen_tpu/priors/) on any machine where
the checkpoints exist and writes the asset, so zero-egress training
machines can consume it via ``init.type=point_e|shap_e``.

    python -m gsgen_tpu.tools.make_init_asset point_e "a corgi" \
        --base /ckpts/base40M-textvec.pt --upsample /ckpts/upsample.pt \
        --clip /models/clip-vit-large-patch14
    python -m gsgen_tpu.tools.make_init_asset shap_e "a corgi" \
        --decoder /ckpts/transmitter.pt --text300m /ckpts/text300M.pt \
        --clip /models/clip-vit-large-patch14
"""

from __future__ import annotations

import argparse


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("kind", choices=["point_e", "shap_e"])
    ap.add_argument("prompt")
    ap.add_argument("--base", help="point-e base40M-textvec checkpoint")
    ap.add_argument("--upsample", help="point-e upsample checkpoint")
    ap.add_argument("--decoder", help="shap-e transmitter/vector_decoder")
    ap.add_argument("--text300m", help="shap-e text300M checkpoint")
    ap.add_argument("--latent", help="shap-e precomputed latent .npy")
    ap.add_argument("--clip", help="CLIP text-encoder dir (conditioning)")
    ap.add_argument("--num-points", type=int, default=4096)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    from .. import priors

    if args.kind == "point_e":
        xyz, rgb = priors.point_e_generate(
            args.prompt, num_points=args.num_points,
            base_weights=args.base, upsample_weights=args.upsample,
            clip_model_dir=args.clip, seed=args.seed)
    else:
        xyz, rgb = priors.shap_e_generate(
            args.prompt, num_points=args.num_points,
            decoder_weights=args.decoder,
            text_model_weights=args.text300m,
            latent_path=args.latent, clip_model_dir=args.clip,
            seed=args.seed)
    path = priors._asset_path(args.kind, args.prompt)
    print(f"wrote {path}  ({xyz.shape[0]} points)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
