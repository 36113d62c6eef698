"""Every recipe exp_cfg must parse, build, and shape-compile.

The published config grid is the quality-parity contract (BASELINE.md rows).
For each recipes/**/exp_cfg/*.yaml: resolve !ref tags, build the model from
train_cfg.model with a dummy vocabulary, run net.init on tiny shapes (this
type-checks every module_conf kwarg against the flax modules), and build the
optimizer chain from optim_sches. Data files are not required.
"""

import glob
import os

import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = sorted(glob.glob(os.path.join(REPO, "recipes", "**", "exp_cfg",
                                        "*.yaml"), recursive=True))
RNG = jax.random.PRNGKey(0)


def _init_shapes(family, model_cfg, vocab):
    B, L = 2, 4
    module_conf = model_cfg.get("module_conf", {})
    fe = (module_conf.get("frontend", {}) or {}).get("conf", {})
    sr = int(fe.get("sr", 16000))
    T = sr // 5                                  # 0.2 s of audio
    hop = max(int(float(fe.get("hop_length", 0.01)) * sr), 1)
    n_frames = T // hop + 1
    text = jax.random.randint(RNG, (B, L), 1, vocab - 1)
    text_len = jnp.full((B,), L, jnp.int32)
    feat = jax.random.normal(RNG, (B, T, 1)) * 0.1
    feat_len = jnp.full((B,), T, jnp.int32)
    if family == "lm":
        return (text, text_len)
    if family == "asr":
        return (feat, feat_len, text, text_len)
    if family == "artts":
        return (text, text_len, feat, feat_len)
    if family == "fastspeech2":
        pitch = jnp.abs(jax.random.normal(RNG, (B, n_frames))) * 100
        pitch_len = jnp.full((B,), n_frames, jnp.int32)
        dur = jnp.full((B, L), float(max(n_frames // L, 1)))
        return (feat if False else text, text_len, feat, feat_len,
                pitch, pitch_len, dur, text_len)
    raise ValueError(family)


@pytest.mark.parametrize(
    "cfg_path", CONFIGS,
    ids=[os.path.relpath(p, os.path.join(REPO, "recipes")) for p in CONFIGS])
def test_exp_cfg_builds_and_compiles(cfg_path):
    from speechain_tpu.builders import build_model
    from speechain_tpu.runner import family_init_args, model_family  # noqa: F401
    from speechain_tpu.train.optim import build_optimizers
    from speechain_tpu.utils.yamlref import load_yaml

    cfg = load_yaml(cfg_path)
    assert "train_cfg" in cfg and "data_cfg" in cfg, cfg_path
    assert "train" in cfg["data_cfg"], cfg_path

    model_cfg = cfg["train_cfg"]["model"]
    vocab = 64
    net, net_cfg, mtype = build_model(model_cfg, vocab)
    family = model_family(mtype)
    args = _init_shapes(family, model_cfg, vocab)
    kwargs = {}
    spk_conf = (model_cfg.get("module_conf", {}) or {}).get("spk_emb")
    if spk_conf and family in ("artts", "fastspeech2"):
        dim = int((spk_conf.get("conf", {}) or {}).get(
            "spk_emb_dim_pretrained", 0))
        if dim:
            kwargs["spk_feat"] = jax.random.normal(RNG, (2, dim))
    variables = net.init({"params": RNG, "dropout": RNG, "specaug": RNG},
                         *args, train=False, **kwargs)
    n_params = sum(x.size for x in
                   jax.tree_util.tree_leaves(variables["params"]))
    assert n_params > 0

    tx = build_optimizers(cfg["train_cfg"].get("optim_sches", {}),
                          steps_per_epoch=100,
                          accum_grad=int(cfg.get("accum_grad", 1)),
                          grad_clip=5.0)
    assert tx is not None

    # infer_cfg (if present) must expand through the runner's product grammar
    if cfg.get("infer_cfg"):
        from speechain_tpu.runner import expand_infer_cfg
        expanded = expand_infer_cfg(cfg["infer_cfg"])
        assert len(expanded) >= 1
