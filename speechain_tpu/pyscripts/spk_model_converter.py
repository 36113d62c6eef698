"""Convert a torch speaker-encoder checkpoint to an orbax directory.

The reference loads pretrained ECAPA-TDNN / x-vector weights from an
``encoder.pth`` torch state dict (reference speechain/module/encoder/
speaker.py:97-116 ``from_hparams`` -> ``load_state_dict``). This CLI
converts such a checkpoint once into the orbax layout every other speaker
surface here consumes (`speechain-spk-feat --checkpoint`,
`speechain-spk-sim --checkpoint`, RandomSpkFeatDataset embeddings):

    python -m speechain_tpu.pyscripts.spk_model_converter \
        --torch_ckpt datasets/spk_emb_models/ecapa/encoder.pth \
        --model_type ecapa --save_path exp/spk_models/ecapa_orbax

A smoke forward (random log-mel batch) validates the converted variables
produce finite, L2-normalized 192-d embeddings before saving.
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--torch_ckpt", required=True,
                   help="torch .pt/.pth state dict (reference encoder.pth)")
    p.add_argument("--model_type", default="ecapa",
                   choices=["ecapa", "xvector"])
    p.add_argument("--save_path", required=True,
                   help="orbax checkpoint dir to create")
    args = p.parse_args(argv)

    import jax.numpy as jnp
    import numpy as np
    import orbax.checkpoint as ocp

    from speechain_tpu.nn.speaker import load_speaker_encoder

    model, variables = load_speaker_encoder(args.torch_ckpt,
                                            args.model_type)
    feat = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 50, 80)), jnp.float32)
    emb = model.apply(variables, feat)
    assert emb.shape == (2, 192) and bool(jnp.isfinite(emb).all()), (
        "converted variables failed the smoke forward")
    norms = jnp.linalg.norm(emb, axis=-1)
    assert bool(jnp.allclose(norms, 1.0, atol=1e-4)), (
        f"embeddings not L2-normalized: {norms}")

    path = os.path.abspath(args.save_path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, variables, force=True)
    ckptr.wait_until_finished()     # the save is async; block before exit
    print(f"converted {args.torch_ckpt} ({args.model_type}) -> {path}")


if __name__ == "__main__":
    main()
