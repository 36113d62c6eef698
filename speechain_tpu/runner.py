"""CLI entry point: config-driven training and evaluation.

Rebuild of reference ``speechain/runner.py:38-2128`` as a TPU-native driver:
- same experiment surface: ``--config`` exp_cfg YAML (with !ref tags)
  containing ``data_cfg`` / ``train_cfg`` / ``infer_cfg``; CLI flags override
  YAML (runner.py:2045-2091 precedence);
- epoch loop with per-epoch seeding, validation every ``valid_per_epochs``,
  best-model selection / pruning / averaging / early stopping, resumable
  full-state checkpointing;
- the DDP machinery (mp.spawn, process groups, skip-flag collectives,
  runner.py:1632-2014) is replaced by one process driving a
  ``jax.sharding.Mesh``: the jitted train step handles all device
  parallelism; data sharding happens in the host loader.

Usage::

    python -m speechain_tpu.runner --config exp_cfg.yaml --train
    python -m speechain_tpu.runner --config exp_cfg.yaml --test \
        --test_model 10_loss_average
"""

from __future__ import annotations

import argparse
import json
import os
import time
from functools import partial
from typing import Any, Dict, Optional

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="speechain_tpu runner")
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--data_cfg", type=str, default=None,
                   help="standalone data_cfg yaml replacing the exp_cfg's "
                        "data_cfg block (reference runner.py data_cfg flag; "
                        "used by recipes/**/data_cfg/*.yaml to tune "
                        "inference on alternative test sets)")
    p.add_argument("--train", action="store_true")
    p.add_argument("--test", action="store_true")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--dry_run", action="store_true",
                   help="data-loading-only epochs (runner.py:338)")
    p.add_argument("--no_optim", action="store_true",
                   help="forward-only steps (runner.py:347)")
    p.add_argument("--result_path", type=str, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--same_proc_seed", action="store_true",
                   help="give every data-parallel host process the SAME "
                        "seed (needed when 'random' data_selection must "
                        "agree across processes, runner.py:276-285); "
                        "default is per-process seed offsets so "
                        "augmentation draws differ per replica")
    p.add_argument("--num_epochs", type=int, default=None)
    p.add_argument("--valid_per_epochs", type=int, default=None)
    p.add_argument("--report_per_steps", type=int, default=None)
    p.add_argument("--accum_grad", type=int, default=None)
    p.add_argument("--grad_clip", type=float, default=None)
    p.add_argument("--use_bf16", action="store_true", default=None)
    p.add_argument("--early_stopping_patience", type=int, default=None)
    p.add_argument("--last_model_num", type=int, default=None)
    p.add_argument("--best_model_num", type=int, default=None)
    p.add_argument("--test_model", type=str, default=None)
    p.add_argument("--ignore_train_exception", action="store_true",
                   help="skip steps that raise (e.g. device OOM) instead of "
                        "aborting the epoch (runner.py:1079-1092)")
    p.add_argument("--ignore_test_exception", action="store_true",
                   help="skip evaluation batches that raise "
                        "(runner.py:1521-1531)")
    p.add_argument("--n_devices", type=int, default=None)
    p.add_argument("--mesh", type=str, default=None,
                   help="device-mesh axis sizes, e.g. 'data=2,model=2' or "
                        "'model=2,seq=2' or 'pipe=4'. Overrides the "
                        "exp_cfg's train_cfg.parallel block. model>1 = "
                        "tensor parallelism (and expert parallelism for "
                        "fdfwd_type: moe), seq>1 = sequence parallelism, "
                        "pipe>1 = pipeline parallelism, fsdp=1 = ZeRO/FSDP "
                        "(params + Adam moments sharded over 'data', "
                        "fsdp_min_size=N sets the smallest sharded leaf); "
                        "these route training through the GSPMD "
                        "global-batch step (parallel/mesh.py); the default "
                        "1-axis dp path stays on shard_map")
    p.add_argument("--batch_bucket", type=int, default=8)
    p.add_argument("--time_bucket", type=int, default=None)
    p.add_argument("--token_bucket", type=int, default=16)
    p.add_argument("--profile_steps", type=int, default=0,
                   help="capture a jax.profiler trace of N train steps "
                        "(after a short warmup) into result_path/profile; "
                        "view with TensorBoard (SURVEY 5.1 TPU tracing)")
    p.add_argument("--num_workers", type=int, default=4,
                   help="host loader worker threads (reference DataLoader "
                        "num_workers)")
    p.add_argument("--steps_per_dispatch", type=int, default=1,
                   help="compile K optimizer updates into one executable "
                        "(lax.scan over stacked same-shape batches); pays "
                        "host/link dispatch latency once per K steps. "
                        "Numerically identical to K single steps. Safe to "
                        "combine with the Pallas kernels: on the current "
                        "toolchain scanned Mosaic matches scanned XLA "
                        "(docs/BENCHMARKS.md 'Scanned multi-step anomaly' "
                        "-- RESOLVED, 1.38 vs 1.39 ms/unit), and the "
                        "runner self-checks at runtime and warns if a "
                        "scanned dispatch ever loses >1.5x on the link.")
    p.add_argument("--num_worker_procs", type=int, default=0,
                   help="host loader worker PROCESSES (collate included); "
                        "use on multi-core hosts where the GIL caps the "
                        "thread loader — counterproductive on 1-core hosts")
    p.add_argument("--coordinator", type=str, default=None,
                   help="multi-host launch: coordinator host:port for "
                        "jax.distributed.initialize (the reference's "
                        "multi-node branch is NotImplementedError, "
                        "runner.py:1986; parallel/multihost.py)")
    p.add_argument("--num_hosts", type=int, default=1,
                   help="multi-host launch: total process count")
    p.add_argument("--host_id", type=int, default=None,
                   help="multi-host launch: this process's id (0-based); "
                        "host 0 owns the canonical result dir")
    p.add_argument("--platform", type=str, default=None,
                   help="force the jax platform (e.g. 'cpu' for the "
                        "multi-process CPU smoke path; the image's "
                        "sitecustomize overrides JAX_PLATFORMS, so an env "
                        "var is not enough)")
    return p.parse_args(argv)


DEFAULTS = dict(seed=0, num_epochs=100, valid_per_epochs=1,
                report_per_steps=100, accum_grad=1, grad_clip=5.0,
                use_bf16=False, early_stopping_patience=10,
                last_model_num=1, best_model_num=5)


def set_random_seeds(seed: int, same_proc_seed: bool = False) -> int:
    """Global host-side seeding (reference runner.py:1575-1589).

    Seeds PYTHONHASHSEED (affects set/dict iteration of newly spawned
    loader worker processes), python `random`, and numpy. By default each
    host process gets ``seed + process_index`` so host-side augmentation
    draws differ per replica (reference runner.py:1641-1643);
    ``same_proc_seed`` forces identical seeds everywhere — required when
    'random' data_selection must pick the same utterances on all processes
    (runner.py:276-285). Device-side randomness is jax.random and is seeded
    separately from the returned value. Returns the effective seed.
    """
    import random as _random

    import jax as _jax

    if not same_proc_seed:
        seed = seed + _jax.process_index()
    os.environ["PYTHONHASHSEED"] = str(seed)
    _random.seed(seed)
    np.random.seed(seed % (2 ** 32))
    return seed


# model families share a train-loop skeleton but differ in init args,
# batch keys and step factories
FAMILY_BATCH_KEYS = {
    # spk_ids double as feat-norm group ids (group granularity,
    # module/norm/feat_norm.py) when the dataset declares speakers
    "asr": ("feat", "feat_len", "text", "text_len", "spk_ids",
            "group_ids"),
    "lm": ("text", "text_len"),
    "artts": ("text", "text_len", "feat", "feat_len", "spk_feat"),
    "fastspeech2": ("text", "text_len", "feat", "feat_len", "pitch",
                    "pitch_len", "duration", "duration_len", "spk_feat"),
}


def model_family(mtype: str) -> str:
    t = mtype.lower()
    if "nar_tts" in t or "fastspeech" in t:
        return "fastspeech2"
    if "ar_tts" in t or "artts" in t:
        return "artts"
    if t == "lm" or t.startswith("lm."):
        return "lm"
    return "asr"


def family_init_args(family: str, b):
    import jax.numpy as jnp
    a = lambda k: jnp.asarray(b[k])
    if family == "asr":
        return (a("feat"), a("feat_len"), a("text"), a("text_len")), {}
    if family == "lm":
        return (a("text"), a("text_len")), {}
    if family == "artts":
        return (a("text"), a("text_len"), a("feat"), a("feat_len")), {}
    if family == "fastspeech2":
        pitch_len = b.get("pitch_len")
        if pitch_len is None and "pitch" in b:
            pitch_len = b["feat_len"]
        return (a("text"), a("text_len"), a("feat"), a("feat_len"),
                a("pitch"), jnp.asarray(pitch_len), a("duration"),
                a("duration_len")), {}
    raise ValueError(family)


def family_step_factory(family: str):
    from speechain_tpu.train import state as S
    if family == "asr":
        return lambda net, cfg, tx, **kw: S.make_arasr_step(
            net, cfg, tx, **kw)
    if family == "lm":
        return lambda net, cfg, tx, **kw: S.make_lm_step(net, tx, **kw)
    if family == "artts":
        return lambda net, cfg, tx, **kw: S.make_artts_step(
            net, cfg, tx, **kw)
    if family == "fastspeech2":
        return lambda net, cfg, tx, **kw: S.make_fastspeech2_step(
            net, cfg, tx, **kw)
    raise ValueError(family)


def merge_config(args) -> Dict[str, Any]:
    """CLI > exp_cfg yaml > defaults (runner.py:2045-2091)."""
    from speechain_tpu.utils.yamlref import load_yaml
    exp_cfg = load_yaml(args.config)
    merged = dict(DEFAULTS)
    for k in DEFAULTS:
        if k in exp_cfg and exp_cfg[k] is not None:
            merged[k] = exp_cfg[k]
        v = getattr(args, k, None)
        if v is not None:
            merged[k] = v
    merged["result_path"] = (args.result_path or exp_cfg.get("result_path")
                             or os.path.join(
                                 os.path.dirname(os.path.abspath(args.config)),
                                 "exp"))
    merged["data_cfg"] = exp_cfg["data_cfg"]
    if getattr(args, "data_cfg", None):
        standalone = load_yaml(args.data_cfg)
        assert "data_cfg" in standalone, (
            f"{args.data_cfg} must define a data_cfg block "
            "(recipes/**/data_cfg/*.yaml schema)")
        merged["data_cfg"] = standalone["data_cfg"]
    merged["train_cfg"] = exp_cfg["train_cfg"]
    merged["infer_cfg"] = exp_cfg.get("infer_cfg", {})
    merged["test_model"] = args.test_model or exp_cfg.get("test_model")
    merged["loss_weights"] = exp_cfg.get("loss_weights")
    merged["visual_snapshot_interval"] = exp_cfg.get(
        "visual_snapshot_interval", 5)
    merged["visual_snapshot_number"] = exp_cfg.get(
        "visual_snapshot_number", 3)
    return merged


def expand_infer_cfg(infer_cfg) -> Dict[str, Dict]:
    """infer_cfg grammar (reference runner.py:1323-1403): a flat dict is one
    unnamed run; {shared_args, exclu_args: [dict, ...]} expands into one
    named run per exclusive-arg combination; a dict of named dicts runs
    each as-is."""
    if not infer_cfg:
        return {"": {}}
    if "exclu_args" in infer_cfg:
        shared = dict(infer_cfg.get("shared_args", {}))
        runs = {}
        for combo in infer_cfg["exclu_args"]:
            name = "_".join(f"{k}={v}" for k, v in sorted(combo.items()))
            runs[name] = {**shared, **combo}
        return runs
    if all(isinstance(v, dict) for v in infer_cfg.values()) and infer_cfg:
        return {str(k): dict(v) for k, v in infer_cfg.items()}
    return {"": dict(infer_cfg)}


def build_data(data_cfg: Dict, split: str, tokenizer, *, batch_bucket=8,
               time_bucket=None, token_bucket=16, num_workers=4,
               num_worker_procs=0, spk2idx=None, dp_size=1, dp_rank=0):
    """data_cfg[split] -> EpochLoader or MultiLoader (runner.py:549-659).

    ``dp_size/dp_rank`` (multi-host launch) row-shard every batch over the
    host processes via the iterator's data-parallel slicing
    (iterator.py:93-113), so each host reads/decodes only its own rows."""
    from speechain_tpu.data.loader import (EpochLoader, MultiLoader,
                                           collate_speech_text)
    from speechain_tpu.utils.registry import resolve

    spec = data_cfg[split]
    tb = time_bucket or 1600

    def one(spec_one):
        it_cls = resolve("iterator." + spec_one["type"]
                         if "." not in spec_one["type"] else spec_one["type"])
        conf = dict(spec_one.get("conf", {}))
        if dp_size > 1:
            conf.setdefault("data_parallel_size", dp_size)
            conf.setdefault("data_parallel_rank", dp_rank)
        it = it_cls(**conf)
        collate = partial(collate_speech_text, tokenizer=tokenizer,
                          time_bucket=tb, token_bucket=token_bucket,
                          batch_bucket=batch_bucket, spk2idx=spk2idx)
        return EpochLoader(it, collate, num_workers=num_workers,
                           num_worker_procs=num_worker_procs)

    if "type" in spec:
        return one(spec)
    return MultiLoader({name: one(s) for name, s in spec.items()})


def load_pretrained(variables: Dict, spec: Dict, logger) -> Dict:
    """Merge a pretrained checkpoint into freshly-initialized variables.

    spec: {path: <orbax dir>, mapping: {old_prefix: new_prefix}, strict:
    bool} (model/abs.py:171-234 semantics: mapping renames source keys;
    strict requires every loaded leaf to find a matching target).
    """
    import flax
    import orbax.checkpoint as ocp

    from speechain_tpu.pyscripts.model_para_renamer import rename_tree

    payload = ocp.StandardCheckpointer().restore(
        os.path.abspath(spec["path"]), None)
    src_params = payload.get("params", payload)
    if spec.get("mapping"):
        src_params = rename_tree(src_params, spec["mapping"])
    flat_src = flax.traverse_util.flatten_dict(src_params)
    flat_dst = flax.traverse_util.flatten_dict(variables["params"])
    loaded, skipped = 0, []
    for path, leaf in flat_src.items():
        if path in flat_dst and flat_dst[path].shape == leaf.shape:
            flat_dst[path] = leaf
            loaded += 1
        else:
            skipped.append("/".join(map(str, path)))
    if skipped and spec.get("strict", True):
        raise KeyError(f"pretrained keys without a target: {skipped[:10]}")
    if skipped:
        logger.warning("pretrained: skipped %d unmatched keys", len(skipped))
    logger.info("pretrained: loaded %d tensors from %s", loaded,
                spec["path"])
    variables = dict(variables)
    variables["params"] = flax.traverse_util.unflatten_dict(flat_dst)
    return variables


def train_main(cfg: Dict, args):
    import jax
    import jax.numpy as jnp

    from speechain_tpu.builders import (build_model, build_spk2idx,
                                        build_tokenizer)
    from speechain_tpu.utils.hardware import enable_hardware_rng
    enable_hardware_rng()  # hardware RNG for dropout/specaug bits on TPU
    from speechain_tpu.parallel.mesh import make_mesh, train_step_under_mesh
    from speechain_tpu.train.checkpoint import (BestModelTracker,
                                                CheckpointManager)
    from speechain_tpu.train.monitor import TrainValidMonitor, setup_logger
    from speechain_tpu.train.optim import build_optimizers
    from speechain_tpu.train.state import init_train_state

    from speechain_tpu.parallel import multihost
    n_hosts, host_id = multihost.process_count(), multihost.process_index()
    result_path = canonical_path = cfg["result_path"]
    if n_hosts > 1 and host_id != 0:
        # host 0 owns the canonical result dir; other hosts keep their
        # logs/monitor artifacts under hosts/h<k> so file writes never
        # collide. Checkpoints are NOT per-host: one cooperative orbax save
        # into the canonical dir (shared fs / GCS on real pods) — see
        # CheckpointManager's multi-host notes.
        result_path = os.path.join(result_path, "hosts", f"h{host_id}")
    os.makedirs(result_path, exist_ok=True)
    logger = setup_logger(os.path.join(result_path, "train.log"))
    if n_hosts > 1:
        logger.info("multi-host: process %d/%d, %d local / %d global "
                    "devices", host_id, n_hosts,
                    len(jax.local_devices()), len(jax.devices()))
    seed = set_random_seeds(int(cfg["seed"]),
                            same_proc_seed=bool(
                                getattr(args, "same_proc_seed", False)))

    # ---- mesh request (CLI --mesh > train_cfg.parallel > dp-only) ------
    from speechain_tpu.parallel.mesh import parse_mesh_spec
    mesh_conf = parse_mesh_spec(getattr(args, "mesh", None)
                                or cfg["train_cfg"].get("parallel"))
    n_model, n_seq = mesh_conf["model"], mesh_conf["seq"]
    n_pipe = mesh_conf["pipe"]
    use_fsdp = bool(mesh_conf.get("fsdp"))
    if use_fsdp and n_pipe > 1:
        raise ValueError("--mesh fsdp=1 cannot be combined with pipe>1 "
                         "(the pipeline path shards params over 'pipe')")
    # model/seq/pipe/fsdp requests run the GSPMD global-batch step
    # (axis_name-free); the plain dp mesh keeps the shard_map fast path
    use_gspmd = n_model > 1 or n_seq > 1 or n_pipe > 1 or use_fsdp

    model_cfg = cfg["train_cfg"]["model"]
    customize = (model_cfg.get("model_conf", {}) or {}).get(
        "customize_conf", {})
    tokenizer = build_tokenizer(customize.get("token_type", "char"),
                                customize.get("token_path"))
    dtype = jnp.bfloat16 if cfg["use_bf16"] else jnp.float32
    net, net_cfg, mtype = build_model(
        model_cfg, tokenizer.vocab_size, dtype,
        bn_axis_name=None if use_gspmd else "data")
    family = model_family(mtype)

    loaders = {}
    for split in ("train", "valid"):
        if split not in cfg["data_cfg"]:
            continue
        loaders[split] = build_data(
            cfg["data_cfg"], split, tokenizer,
            batch_bucket=args.batch_bucket,
            time_bucket=args.time_bucket, token_bucket=args.token_bucket,
            num_workers=getattr(args, "num_workers", 4),
            num_worker_procs=getattr(args, "num_worker_procs", 0),
            spk2idx=build_spk2idx(customize.get("spk_list")),
            dp_size=n_hosts, dp_rank=host_id)

    # ---- model + optimizer + mesh --------------------------------------
    rng = jax.random.PRNGKey(seed)
    first_batch = next(loaders["train"].epoch(0))
    if isinstance(first_batch, dict) and all(
            isinstance(v, dict) for v in first_batch.values()) \
            and "feat" not in first_batch:
        # multi-domain: initialize from the first named stream
        if family not in ("asr", "artts"):
            raise ValueError("multi-dataloader training supports asr/artts, "
                             f"not {family}")
        first_batch = next(iter(first_batch.values()))
    init_args, init_kwargs = family_init_args(family, first_batch)
    variables = net.init(
        {"params": rng, "dropout": rng, "specaug": rng},
        *init_args, train=False, **init_kwargs)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(
        variables["params"]))
    logger.info("model %s: %.2fM parameters", mtype, n_params / 1e6)
    from speechain_tpu.train.monitor import model_summary
    logger.info("%s", model_summary(variables["params"], name=mtype))

    # pretrained-model loading with key mapping (model/abs.py:171-234)
    pretrained = (model_cfg.get("model_conf", {}) or {}).get(
        "pretrained_model") or []
    if isinstance(pretrained, dict):
        pretrained = [pretrained]
    for spec in pretrained:
        variables = load_pretrained(variables, spec, logger)

    steps_per_epoch = max(len(loaders["train"]), 1)
    tx = build_optimizers(cfg["train_cfg"].get("optim_sches", {}),
                          steps_per_epoch=steps_per_epoch,
                          accum_grad=cfg["accum_grad"],
                          grad_clip=cfg["grad_clip"],
                          # FSDP shards the Adam moments per-leaf like
                          # their params (parallel/mesh.py shard_state)
                          flatten=not use_fsdp)
    state = init_train_state(variables, tx)

    n_dev = args.n_devices or len(jax.devices())
    n_data = mesh_conf["data"] or max(
        1, n_dev // (n_model * n_seq * n_pipe))
    mesh = make_mesh(n_data=n_data, n_model=n_model, n_seq=n_seq,
                     n_pipe=n_pipe)
    axis = None if use_gspmd else "data"
    sharding_rules = None
    if use_gspmd:
        from functools import partial as _partial

        from speechain_tpu.parallel.mesh import make_param_rules
        from speechain_tpu.parallel.mesh import train_step_gspmd
        sharding_rules = make_param_rules(
            mesh, fsdp=use_fsdp,
            fsdp_min_size=mesh_conf.get("fsdp_min_size", 1 << 16))
        _wrap = _partial(train_step_gspmd, rules=sharding_rules)
    else:
        _wrap = train_step_under_mesh
    logger.info("mesh: %s (%s step path)",
                dict(zip(mesh.axis_names, mesh.devices.shape)),
                "pipeline" if n_pipe > 1 else
                "GSPMD+FSDP" if use_fsdp else
                "GSPMD" if use_gspmd else "shard_map dp")
    from speechain_tpu.data.loader import MultiLoader
    multi_domain = isinstance(loaders["train"], MultiLoader)
    if n_pipe > 1:
        # pipeline-parallel training path (parallel/pipeline.py): the
        # encoder layer stack is stage-split over 'pipe'; microbatch count
        # from the mesh spec ('micro', default one per stage) sets the
        # GPipe gradient-accumulation window
        if family not in ("lm", "asr") or multi_domain:
            raise ValueError(
                "--mesh pipe>1 pipelines the lm and asr families "
                f"(got {family}{' multi-domain' if multi_domain else ''}); "
                "use model=/seq= axes for the other families")
        if n_model > 1 or n_seq > 1:
            raise ValueError("pipe cannot be combined with model/seq yet")
        n_micro = mesh_conf["micro"] or None
        if family == "lm":
            from speechain_tpu.parallel.pipeline import make_lm_pipeline_step
            ls = float((cfg["train_cfg"]["model"].get("model_conf", {}) or {})
                       .get("customize_conf", {}).get("label_smoothing", 0.0))
            jtrain = make_lm_pipeline_step(
                net, tx, mesh, n_micro=n_micro, label_smoothing=ls,
                train=True)
            jvalid = make_lm_pipeline_step(
                net, tx, mesh, n_micro=n_micro, label_smoothing=ls,
                train=False, donate_state=False)
        else:
            # ARASR: transformer encoder pipelined, decoder data-parallel
            # across stages on scattered shares (parallel/pipeline.py)
            from speechain_tpu.parallel.pipeline import (
                make_arasr_pipeline_step)
            jtrain = make_arasr_pipeline_step(
                net, net_cfg, tx, mesh, n_micro=n_micro, train=True)
            jvalid = make_arasr_pipeline_step(
                net, net_cfg, tx, mesh, n_micro=n_micro, train=False,
                donate_state=False)
    elif multi_domain:
        from speechain_tpu.train.state import (make_multi_domain_arasr_step,
                                               make_multi_domain_artts_step)
        loss_weights = cfg["train_cfg"].get("loss_weights") \
            or cfg.get("loss_weights")
        md_factory = (make_multi_domain_artts_step if family == "artts"
                      else make_multi_domain_arasr_step)
        if family not in ("asr", "artts"):
            raise ValueError(
                f"multi-dataloader training supports asr/artts, not {family}")
        jtrain = _wrap(
            md_factory(net, net_cfg, tx, loss_weights=loss_weights,
                       axis_name=axis, train=True), mesh)
        mk_valid = family_step_factory(family)
        jvalid = _wrap(
            mk_valid(net, net_cfg, tx, axis_name=axis,
                     train=False), mesh, donate_state=False)
    else:
        mk_step = family_step_factory(family)
        jtrain = _wrap(
            mk_step(net, net_cfg, tx, axis_name=axis, train=True), mesh)
        jvalid = _wrap(
            mk_step(net, net_cfg, tx, axis_name=axis, train=False),
            mesh, donate_state=False)

    # device-resident multi-step dispatch: K same-shape batches scanned in
    # one executable. The step folds rng by state.step internally, so this
    # is numerically identical to K single jtrain calls (test_multi_step).
    spd = max(1, int(getattr(args, "steps_per_dispatch", 1) or 1))
    jtrain_multi = None
    if spd > 1 and not multi_domain and n_pipe == 1 and not args.dry_run \
            and not args.no_optim:
        from speechain_tpu.parallel.mesh import (multi_batch_step_gspmd,
                                                 multi_batch_step_under_mesh)
        if use_gspmd:
            from functools import partial as _partial
            mk_multi = _partial(multi_batch_step_gspmd,
                                rules=sharding_rules)
        else:
            mk_multi = multi_batch_step_under_mesh
        jtrain_multi = mk_multi(
            mk_step(net, net_cfg, tx, axis_name=axis, train=True), mesh)

    ckpt = CheckpointManager(canonical_path)
    tracker = BestModelTracker(
        rules=[("loss", "min", cfg["best_model_num"])],
        last_n=cfg["last_model_num"],
        early_stopping_patience=cfg["early_stopping_patience"])
    monitor = TrainValidMonitor(result_path, logger,
                                report_per_steps=cfg["report_per_steps"])
    from speechain_tpu.train.visualizer import ValidVisualizer
    visualizer = ValidVisualizer(
        family, monitor.shooter, tokenizer=tokenizer, net_cfg=net_cfg,
        snapshot_number=int(cfg.get("visual_snapshot_number", 3) or 0),
        snapshot_interval=int(cfg.get("visual_snapshot_interval", 5) or 0),
        sample_rate=int(getattr(getattr(net_cfg, "frontend", None), "sr",
                                16000) or 16000),
        logger=logger)
    start_epoch = 1
    if args.resume and ckpt.has_checkpoint():
        state, meta = ckpt.restore_train_state(state)
        if meta:
            start_epoch = meta.get("epoch", 0) + 1
            if "monitor" in meta:
                monitor.load_state_dict(meta["monitor"])
            if "tracker" in meta:
                tracker.load_state_dict(meta["tracker"])
            if "visualizer" in meta:
                visualizer.load_state_dict(meta["visualizer"])
        logger.info("resumed from epoch %d", start_epoch - 1)

    if n_hosts > 1:
        # identical host-local state/rng on every process (same seed or
        # same restored checkpoint) -> replicated global arrays, so the
        # jitted step sees one logical program over the global mesh
        state = multihost.replicate(state, mesh)
        rng = multihost.replicate(rng, mesh)
    elif use_gspmd and n_pipe == 1:
        # place the state at rest under the mesh's sharding rules (tp
        # kernels over 'model'; with fsdp=1 params + Adam moments over
        # 'data' too — ZeRO at-rest memory). Done after the resume restore
        # so restored host arrays get the same placement.
        from speechain_tpu.parallel.mesh import shard_state
        state = shard_state(state, mesh, sharding_rules)
        if use_fsdp:
            per_dev = sum(
                x.addressable_shards[0].data.nbytes
                for t in (state.params, state.opt_state)
                for x in jax.tree_util.tree_leaves(t)
                if hasattr(x, "addressable_shards"))
            logger.info("FSDP at-rest params+opt: %.2f MB/device",
                        per_dev / 2**20)

    def to_device_batch(b, _epoch=None):
        if multi_domain and all(isinstance(v, dict) for v in b.values()):
            return {name: to_device_batch(sub, _epoch)
                    for name, sub in b.items()}
        out = {k: v for k, v in b.items()
               if k in FAMILY_BATCH_KEYS[family] and v is not None}
        if _epoch is not None:
            out["epoch"] = np.asarray(_epoch, np.int32)
        if n_hosts > 1:
            # per-host row slices -> one globally data-sharded batch
            return multihost.global_batch(out, mesh)
        return {k: jnp.asarray(v) for k, v in out.items()}

    # jax.profiler tracing window (the TPU replacement for the reference's
    # wall-clock-only measure_time tracing, monitor.py:126-148): skip the
    # first compile-heavy steps, then capture profile_steps steps.
    profile_steps = max(0, int(getattr(args, "profile_steps", 0) or 0))
    profile_warmup, profile_state, global_step = 3, "off", 0

    spd_check = {"single": dict(time=0.0, steps=0, seen=0),
                 "multi": dict(time=0.0, steps=0, seen=0), "warned": False}
    for epoch in range(start_epoch, cfg["num_epochs"] + 1):
        ep_rng = jax.random.fold_in(rng, epoch)
        t_ep = time.time()
        from speechain_tpu.data.loader import device_prefetch
        if args.dry_run:
            train_iter = loaders["train"].epoch(epoch)
        elif n_hosts > 1:
            # no prefetch thread: global_batch issues a tiny shape-consensus
            # collective per batch, which must stay ordered with the step
            # collectives across hosts
            train_iter = (to_device_batch(b, epoch)
                          for b in loaders["train"].epoch(epoch))
        else:
            train_iter = device_prefetch(loaders["train"].epoch(epoch),
                                         lambda b: to_device_batch(b, epoch))

        def chunked(it):
            """Group consecutive SAME-SHAPE device batches into runs of up
            to ``spd`` for one-dispatch scanning; shape changes (bucket
            boundaries) flush the run."""
            if jtrain_multi is None:
                for db in it:
                    yield [db]
                return
            pending, sig = [], None

            def shapes(b):
                return tuple(sorted(
                    (k, tuple(getattr(v, "shape", ())), str(getattr(
                        v, "dtype", ""))) for k, v in b.items()))
            for db in it:
                s = shapes(db)
                if pending and s != sig:
                    yield pending
                    pending = []
                sig = s
                pending.append(db)
                if len(pending) == spd:
                    yield pending
                    pending, sig = [], None
            if pending:
                yield pending

        for chunk in chunked(train_iter):
            t_chunk = time.time()
            if profile_steps and profile_state == "off" \
                    and global_step >= profile_warmup:
                jax.profiler.start_trace(
                    os.path.join(result_path, "profile"))
                profile_state, profile_end = "on", global_step + profile_steps
                logger.info("profiler trace started (steps %d-%d)",
                            global_step, profile_end - 1)
            step_metrics = []
            with monitor.measure_time("step_time", n=len(chunk)):
                if args.dry_run:
                    continue
                try:
                    if args.no_optim:
                        _, metrics = jvalid(state, chunk[0], ep_rng)
                        step_metrics = [metrics]
                    elif len(chunk) < spd or jtrain_multi is None:
                        # short chunks (bucket boundaries / epoch tails) run
                        # as single steps — jtrain_multi would recompile its
                        # K-step scan for every distinct chunk length
                        for db in chunk:
                            state, metrics = jtrain(state, db, ep_rng)
                            step_metrics.append(metrics)
                    else:
                        stacked = jax.tree_util.tree_map(
                            lambda *xs: jnp.stack(xs, 0), *chunk)
                        state, metrics = jtrain_multi(state, stacked,
                                                      ep_rng)
                        step_metrics = [
                            jax.tree_util.tree_map(lambda m, i=i: m[i],
                                                   metrics)
                            for i in range(len(chunk))]
                except Exception:
                    # step-level fault tolerance (runner.py:1079-1092)
                    if not args.ignore_train_exception:
                        raise
                    logger.exception("step skipped after exception")
                    continue
            global_step += len(chunk)
            if spd > 1 and not args.dry_run and not args.no_optim:
                # --steps_per_dispatch self-check (docs/BENCHMARKS.md
                # "Scanned multi-step anomaly"): on some device links a
                # Mosaic-kernel scan executes far slower than the same
                # steps dispatched singly. Compare the two dispatch kinds'
                # measured per-step wall time (monitor.train_step's host
                # reads act as barriers) and warn once if scanning loses.
                kind = ("multi" if len(chunk) == spd
                        and jtrain_multi is not None else "single")
                rec = spd_check[kind]
                rec["seen"] += len(chunk)
                if rec["seen"] > 40:            # skip the warm-up knee
                    rec["time"] += time.time() - t_chunk
                    rec["steps"] += len(chunk)
                s, mlt = spd_check["single"], spd_check["multi"]
                if (not spd_check["warned"] and s["steps"] >= 8
                        and mlt["steps"] >= 2 * spd):
                    per_s = s["time"] / s["steps"]
                    per_m = mlt["time"] / mlt["steps"]
                    if per_m > 1.5 * per_s:
                        spd_check["warned"] = True
                        logger.warning(
                            "--steps_per_dispatch %d is SLOWER than single"
                            "-step dispatch on this device link (%.0f vs "
                            "%.0f ms/step); rerun with "
                            "--steps_per_dispatch 1 (see docs/"
                            "BENCHMARKS.md 'Scanned multi-step anomaly')",
                            spd, per_m * 1e3, per_s * 1e3)
            if profile_state == "on" and global_step >= profile_end:
                jax.block_until_ready(step_metrics[-1]["loss"])
                jax.profiler.stop_trace()
                profile_state = "done"
                logger.info("profiler trace written to %s",
                            os.path.join(result_path, "profile"))
            for metrics in step_metrics:
                monitor.train_step(metrics)
        monitor.finish_train_epoch(epoch)
        monitor.record_trainable_scalars(state.params, epoch)
        monitor.log_device_memory()

        if epoch % cfg["valid_per_epochs"] == 0 and not args.dry_run \
                and "valid" in loaders:
            for batch in loaders["valid"].epoch(epoch):
                if isinstance(batch, dict) and batch and all(
                        isinstance(v, dict) for v in batch.values()) \
                        and "feat" not in batch and "text" not in batch:
                    # multi-domain: visualize the first valid domain (the
                    # reference's visual_domain pick, runner.py:994-1007)
                    visualizer.maybe_select(
                        batch[sorted(batch.keys())[0]])
                else:
                    visualizer.maybe_select(batch)
                db = to_device_batch(batch, epoch)
                _, metrics = jvalid(state, db, ep_rng)
                monitor.valid_step(metrics)
            valid_summary = monitor.finish_valid_epoch(epoch)

            # deep validation visualization every N epochs (reference
            # model.visualize branch driven by the valid monitor,
            # model/ar_asr.py:602-727, monitor.py:741-771): per-sample
            # metric curves, audio/real-text once, hypothesis history,
            # per-layer/head attention grids + .npz dumps. Multi-host:
            # every process runs the same forward on the host-0 sample;
            # only process 0 writes (train/visualizer.py).
            visualizer.snapshot(
                epoch, net, {"params": state.params, **state.mutables},
                ep_rng)

            ckpt.save_epoch_model(epoch, state.params, state.mutables)
            decision = tracker.update(epoch, valid_summary)
            ckpt.prune_epochs(decision["keep"])
            # best/latest registry (the reference's symlink farm,
            # monitor.py:929-957, as a json index); models_dir is shared
            # in multi-host mode, so only the primary writes it
            if host_id == 0:
                with open(os.path.join(ckpt.models_dir, "registry.json"),
                          "w") as f:
                    json.dump(dict(best=decision["best"],
                                   keep=decision["keep"], latest=epoch,
                                   records=tracker.records), f, indent=1)
            ckpt.save_train_state(state, extra=dict(
                epoch=epoch, monitor=monitor.state_dict(),
                tracker=tracker.state_dict(),
                visualizer=visualizer.state_dict()))
            if decision["early_stop"]:
                logger.info("early stopping at epoch %d", epoch)
                break
        logger.info("epoch %d done in %.1fs", epoch, time.time() - t_ep)

    if profile_state == "on":  # ran out of steps before the window closed
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s (training ended inside "
                    "the profile window)", os.path.join(result_path,
                                                        "profile"))

    # final N-best average (monitor.py:1031-1121)
    decision = tracker.update(cfg["num_epochs"] + 1, {})
    best = decision["best"].get(tracker.rules[0][0], [])
    if len(best) > 1:
        template = {"params": jax.device_get(state.params),
                    **jax.device_get(state.mutables)}
        ckpt.average_models(best, template,
                            name=f"{tracker.rules[0][0]}_average")
    ckpt.close()   # land + commit the in-flight async save
    monitor.close()
    logger.info("training finished")
    return state


def test_main(cfg: Dict, args):
    import jax
    import jax.numpy as jnp

    from speechain_tpu.builders import (build_model, build_spk2idx,
                                        build_tokenizer)
    from speechain_tpu.infer.asr import asr_beam_search
    from speechain_tpu.train.checkpoint import CheckpointManager
    from speechain_tpu.train.monitor import setup_logger
    from speechain_tpu.utils.metrics import batch_error_rates
    from speechain_tpu.utils.reports import write_test_reports

    result_path = cfg["result_path"]
    logger = setup_logger(os.path.join(result_path, "test.log"))
    model_cfg = cfg["train_cfg"]["model"]
    customize = (model_cfg.get("model_conf", {}) or {}).get(
        "customize_conf", {})
    tokenizer = build_tokenizer(customize.get("token_type", "char"),
                                customize.get("token_path"))
    net, net_cfg, mtype = build_model(model_cfg, tokenizer.vocab_size)
    family = model_family(mtype)

    ckpt = CheckpointManager(result_path)
    state_template = None  # restored payload is a dict of arrays
    name = cfg.get("test_model") or "latest"
    if name == "latest" or name is None:
        state, meta = ckpt.restore_train_state(None)
        variables = {"params": state["params"], **state["mutables"]}
    else:
        # epoch number or averaged-model name
        path_epoch = name.replace("epoch_", "")
        payload = ckpt.restore_epoch_model(int(path_epoch), state_template) \
            if path_epoch.isdigit() else None
        if payload is None:
            import orbax.checkpoint as ocp
            payload = ocp.StandardCheckpointer().restore(
                os.path.join(result_path, "models", name), None)
        variables = dict(payload)

    if family in ("artts", "fastspeech2"):
        return tts_test_main(cfg, args, net, net_cfg, tokenizer, variables,
                             name, logger)
    if family == "lm":
        return lm_test_main(cfg, args, net, tokenizer, variables, name,
                            logger)

    infer_runs = expand_infer_cfg(cfg.get("infer_cfg") or {})
    test_loaders = {k: v for k, v in cfg["data_cfg"].items()
                    if k not in ("train", "valid")}
    all_results = {}
    from speechain_tpu.infer.asr import make_asr_decoder

    lm_bundle = {}

    def _load_lm(infer_cfg):
        """Lazy external-LM load for joint decoding (model/ar_asr.py:796-846:
        lm_model_cfg yaml + lm_model_path weights from customize_conf, with
        infer_cfg overrides; initialized once per test session)."""
        if "net" in lm_bundle:
            return lm_bundle["net"], lm_bundle["vars"]
        import orbax.checkpoint as ocp

        from speechain_tpu.builders import build_lm
        from speechain_tpu.utils.yamlref import load_yaml as _ly
        lm_conf = (infer_cfg.get("lm_model_cfg")
                   or customize.get("lm_model_cfg"))
        lm_path = (infer_cfg.get("lm_model_path")
                   or customize.get("lm_model_path"))
        assert lm_conf is not None and lm_path is not None, (
            "ASR-LM joint decoding needs lm_model_cfg and lm_model_path "
            "(in infer_cfg or model customize_conf)")
        if isinstance(lm_conf, str):
            lm_conf = _ly(lm_conf)
        for key in ("train_cfg", "model", "module_conf"):
            if isinstance(lm_conf, dict) and key in lm_conf:
                lm_conf = lm_conf[key]
        lm_net, _ = build_lm(lm_conf, tokenizer.vocab_size)
        payload = ocp.StandardCheckpointer().restore(
            os.path.abspath(lm_path), None)
        lm_vars = {"params": payload.get("params", payload)}
        logger.info("external LM loaded from %s", lm_path)
        lm_bundle["net"], lm_bundle["vars"] = lm_net, lm_vars
        return lm_net, lm_vars

    for run_name, infer_cfg in infer_runs.items():
      run_vars = variables
      wq = infer_cfg.get("weight_quant")
      if wq:
          # weight-only int8 serving (infer/quantize.py): the decode
          # executables receive int8 weights + per-channel scales and
          # dequantize in-executable
          assert str(wq).lower() == "int8", \
              f"weight_quant must be 'int8', got {wq!r}"
          from speechain_tpu.infer.quantize import (quantize_variables,
                                                    quantized_bytes)
          run_vars = quantize_variables(
              variables,
              min_elems=int(infer_cfg.get("weight_quant_min_elems", 8192)))
          now, deq = quantized_bytes(run_vars)
          logger.info("weight_quant=int8: resident variables %.1f MiB "
                      "(float: %.1f MiB)", now / 2**20, deq / 2**20)
      lm_kwargs = {}
      if float(infer_cfg.get("lm_weight", 0.0)) > 0.0:
          lm_net, lm_vars = _load_lm(infer_cfg)
          lm_kwargs = dict(
              lm_net=lm_net, lm_variables=lm_vars,
              lm_weight=float(infer_cfg["lm_weight"]),
              lm_temperature=float(infer_cfg.get("lm_temperature", 1.0)),
              lm_window_size=infer_cfg.get("lm_window_size"),
              ilm_sub_weight=float(infer_cfg.get("ilm_sub_weight", 0.0)))
      teacher = bool(infer_cfg.get("teacher_forcing", False))
      if teacher:
          from speechain_tpu.infer.asr import make_asr_teacher_scorer
          teacher_fn = make_asr_teacher_scorer(
              net, temperature=float(infer_cfg.get("temperature", 1.0)))
      decode_fn = make_asr_decoder(
          net,
          beam_size=int(infer_cfg.get("beam_size", 4)),
          temperature=float(infer_cfg.get("temperature", 1.0)),
          ctc_weight=float(infer_cfg.get("ctc_weight", 0.0)),
          ctc_temperature=float(infer_cfg.get("ctc_temperature", 1.0)),
          length_penalty=float(infer_cfg.get("length_penalty", 1.0)),
          min_f2t_ratio=float(infer_cfg.get("min_f2t_ratio", 3.0)),
          eos_filtering=bool(infer_cfg.get("eos_filtering", False)),
          eos_threshold=float(infer_cfg.get("eos_threshold", 1.5)),
          sent_per_beam=int(infer_cfg.get("sent_per_beam", 1)),
          **lm_kwargs)
      for set_name in (test_loaders or {"valid": None}):
        loader = build_data(cfg["data_cfg"], set_name, tokenizer,
                            batch_bucket=args.batch_bucket,
                            time_bucket=args.time_bucket,
                            token_bucket=args.token_bucket)
        out_dir = os.path.join(result_path, name,
                               *( [run_name] if run_name else [] ), set_name)
        progress_path = os.path.join(out_dir, "tmp_progress.json")
        idx2hypo, idx2cer, idx2wer = {}, {}, {}
        idx2confid, idx2ratio, idx2nbest = {}, {}, {}
        if os.path.exists(progress_path):
            # resumable evaluation (runner.py:1540-1548 per-rank
            # checkpoints): skip already-decoded utterances
            with open(progress_path) as f:
                saved = json.load(f)
            idx2hypo, idx2cer, idx2wer = (saved["hypo"], saved["cer"],
                                          saved["wer"])
            idx2confid = saved.get("confid", {})
            idx2ratio = saved.get("ratio", {})
            idx2nbest = saved.get("nbest", {})
            logger.info("resuming evaluation: %d utterances done",
                        len(idx2hypo))
        done = set(idx2hypo)
        steps_since_save = 0
        for batch in loader.epoch(0):
            if all(idx in done for idx in batch["indices"]):
                continue
            try:
                if teacher:
                    # teacher-forced confidence scoring of the ground-truth
                    # text (model/ar_asr.py:874-921) — the chain recipes
                    # filter pseudo-labeled data on these outputs
                    out = teacher_fn(run_vars,
                                     jnp.asarray(batch["feat"]),
                                     jnp.asarray(batch["feat_len"]),
                                     jnp.asarray(batch["text"]),
                                     jnp.asarray(batch["text_len"]))
                else:
                    # speaker-declared sets select their group's feat-norm
                    # stats at test time too (feat_norm.py group mode only;
                    # under global norm speaker indices are NOT group ids)
                    fn_cfg = getattr(net.cfg, "feat_norm", None)
                    gid = (batch.get("spk_ids")
                           if fn_cfg is not None
                           and fn_cfg.norm_type == "group" else None)
                    out = decode_fn(
                        run_vars, jnp.asarray(batch["feat"]),
                        jnp.asarray(batch["feat_len"]),
                        group_ids=(None if gid is None
                                   else jnp.asarray(gid)))
            except Exception:
                # batch-level fault tolerance (runner.py:1521-1531)
                if not getattr(args, "ignore_test_exception", False):
                    raise
                logger.exception("evaluation batch skipped after exception")
                continue
            n = batch["n_real"]
            hyps = [tokenizer.tensor2text(
                np.asarray(out["hypo_text"][i][:int(out["hypo_text_len"][i])]))
                for i in range(n)]
            refs = batch["raw_text"]
            cers, wers, _ = batch_error_rates(hyps, refs)
            for i, idx in enumerate(batch["indices"]):
                idx2hypo[idx], idx2cer[idx], idx2wer[idx] = \
                    hyps[i], cers[i], wers[i]
                idx2confid[idx] = float(out["hypo_text_confid"][i])
                idx2ratio[idx] = float(out["feat_token_len_ratio"][i])
                if "nbest_text" in out:
                    idx2nbest[idx] = " | ".join(
                        tokenizer.tensor2text(np.asarray(
                            out["nbest_text"][i, j][
                                :int(out["nbest_text_len"][i, j])]))
                        for j in range(out["nbest_text"].shape[1]))
            steps_since_save += 1
            if steps_since_save >= 10:
                os.makedirs(out_dir, exist_ok=True)
                with open(progress_path, "w") as f:
                    json.dump(dict(hypo=idx2hypo, cer=idx2cer,
                                   wer=idx2wer, confid=idx2confid,
                                   ratio=idx2ratio, nbest=idx2nbest), f)
                steps_since_save = 0
        if os.path.exists(progress_path):
            os.remove(progress_path)
        summary = dict(cer=float(np.mean(list(idx2cer.values()))),
                       wer=float(np.mean(list(idx2wer.values()))))
        logger.info("%s: %s", set_name, summary)
        write_test_reports(out_dir,
                           idx2hypo=idx2hypo, idx2cer=idx2cer,
                           idx2wer=idx2wer, summary=summary)
        # configurable (metric, mode, N) bad-case reports (reference
        # ar_asr.py:330-339 defaults, infer_cfg.bad_cases_selection override)
        from speechain_tpu.utils.reports import write_bad_case_reports
        write_bad_case_reports(
            out_dir,
            metrics=dict(cer=idx2cer, wer=idx2wer, text_confid=idx2confid,
                         feat_token_len_ratio=idx2ratio),
            idx2hypo=idx2hypo,
            selection=infer_cfg.get("bad_cases_selection"))
        from speechain_tpu.utils.reports import write_idx2_file
        write_idx2_file({k: f"{v:.4f}" for k, v in idx2confid.items()},
                        os.path.join(out_dir, "idx2text_confid"))
        write_idx2_file({k: f"{v:.4f}" for k, v in idx2ratio.items()},
                        os.path.join(out_dir, "idx2feat_token_len_ratio"))
        if idx2nbest:
            write_idx2_file(idx2nbest, os.path.join(out_dir, "idx2nbest"))
        all_results[f"{run_name}/{set_name}" if run_name
                    else set_name] = summary
    return all_results


def tts_test_main(cfg, args, net, net_cfg, tokenizer, variables, name,
                  logger):
    """TTS evaluation: synthesize the test sets, write wavs, score MCD /
    log-F0 RMSE against the reference audio (recipes/tts flow:
    tts_evaluation.py + feat_to_wav)."""
    import jax
    import jax.numpy as jnp

    from speechain_tpu.infer.tts_decoding import tts_auto_regression
    from speechain_tpu.models.ar_tts import ARTTSConfig
    from speechain_tpu.ops.griffin_lim import logmel_to_wave
    from speechain_tpu.utils.fileio import write_idx2data_file, write_wav
    from speechain_tpu.utils.reports import md_table, write_idx2_file
    from speechain_tpu.utils.tts_eval import log_f0_rmse, mcd

    infer_cfg = next(iter(expand_infer_cfg(
        cfg.get("infer_cfg") or {}).values()))
    is_ar = isinstance(net_cfg, ARTTSConfig)
    synth_vars = variables
    wq = infer_cfg.get("weight_quant")
    if wq and is_ar:
        # weight-only int8 serving of the jitted AR synthesizer
        # (infer/quantize.py); recover_feat below keeps the float tree
        # (it reads norm stats eagerly, outside the jit boundary)
        assert str(wq).lower() == "int8", \
            f"weight_quant must be 'int8', got {wq!r}"
        from speechain_tpu.infer.quantize import quantize_variables
        synth_vars = quantize_variables(
            variables,
            min_elems=int(infer_cfg.get("weight_quant_min_elems", 8192)))
    result_path = cfg["result_path"]
    test_sets = {k: v for k, v in cfg["data_cfg"].items()
                 if k not in ("train", "valid")} or {"valid": None}
    all_results = {}
    for set_name in test_sets:
        loader = build_data(cfg["data_cfg"], set_name, tokenizer,
                            batch_bucket=args.batch_bucket,
                            time_bucket=args.time_bucket,
                            token_bucket=args.token_bucket)
        out_dir = os.path.join(result_path, name, set_name)
        wav_dir = os.path.join(out_dir, "wav")
        os.makedirs(wav_dir, exist_ok=True)
        idx2wav, idx2mcd, idx2f0 = {}, {}, {}
        synth = None
        for batch in loader.epoch(0):
            n = batch["n_real"]
            text = jnp.asarray(batch["text"])
            text_len = jnp.asarray(batch["text_len"])
            if is_ar:
                if synth is None:
                    from speechain_tpu.infer.tts_decoding import (
                        make_tts_synthesizer)
                    synth = make_tts_synthesizer(
                        net,
                        stop_threshold=float(infer_cfg.get(
                            "stop_threshold", 0.5)),
                        maxlen_ratio=float(infer_cfg.get("maxlen_ratio",
                                                         10.0)),
                        max_frames=int(infer_cfg.get("max_frames", 1024)))
                out = synth(synth_vars, text, text_len,
                            spk_feat=(jnp.asarray(batch["spk_feat"])
                                      if "spk_feat" in batch else None))
                feat, feat_len = out["hypo_feat"], out["hypo_feat_len"]
                feat = net.apply(variables, feat, method=net.recover_feat)
            else:
                # controllable TTS (model/nar_tts.py:706-785): fixed or
                # random duration/pitch/energy multipliers from infer_cfg
                from speechain_tpu.models.nar_tts import generate_ctrl_alpha
                alphas = {}
                for kind in ("duration", "pitch", "energy"):
                    a = infer_cfg.get(f"{kind}_alpha")
                    if a is None:
                        continue
                    if isinstance(a, (int, float)):
                        alphas[f"{kind}_alpha"] = generate_ctrl_alpha(
                            None, text.shape[0], text.shape[1],
                            alpha=float(a))
                    else:  # dict: {alpha_min, alpha_max, granularity}
                        alphas[f"{kind}_alpha"] = generate_ctrl_alpha(
                            jax.random.PRNGKey(
                                int(a.get("seed", 0))), text.shape[0],
                            text.shape[1],
                            alpha_min=float(a.get("alpha_min", 0.8)),
                            alpha_max=float(a.get("alpha_max", 1.2)),
                            granularity=a.get("granularity", "utterance"))
                fs_out = net.apply(
                    variables, text, text_len,
                    spk_feat=(jnp.asarray(batch["spk_feat"])
                              if "spk_feat" in batch else None),
                    train=False, max_frames=int(infer_cfg.get(
                        "max_frames", 1024)),
                    min_frame_num=int(infer_cfg.get("min_frame_num", 0)),
                    max_frame_num=infer_cfg.get("max_frame_num", 50),
                    rngs={"dropout": jax.random.PRNGKey(0)}, **alphas)
                feat, feat_len = fs_out["pred_after"], fs_out["pred_feat_len"]
                feat = net.apply(variables, feat, method=net.recover_feat)
            wave, wave_len = logmel_to_wave(
                feat, feat_len, net_cfg.frontend,
                n_iter=int(infer_cfg.get("gl_iters", 32)))
            for i in range(n):
                idx = batch["indices"][i]
                nlen = int(wave_len[i])
                path = os.path.join(wav_dir, f"{idx}.wav")
                write_wav(path, np.asarray(wave[i][:nlen]),
                          net_cfg.frontend.sr)
                idx2wav[idx] = path
                # objective scores vs the reference audio when present
                if "feat" in batch:
                    ref = np.asarray(batch["feat"][i][
                        :int(batch["feat_len"][i])]).reshape(-1)
                    hyp = np.asarray(wave[i][:nlen])
                    try:
                        m = mcd(hyp, ref, net_cfg.frontend.sr)
                        if m is not None:
                            idx2mcd[idx] = m
                        f0 = log_f0_rmse(hyp, ref, net_cfg.frontend.sr)
                        if f0 is not None:
                            idx2f0[idx] = f0
                    except Exception:
                        logger.exception("tts scoring failed for %s", idx)
        write_idx2data_file(idx2wav, os.path.join(out_dir, "idx2wav"))
        summary = {}
        if idx2mcd:
            summary["mcd"] = float(np.mean(list(idx2mcd.values())))
            write_idx2_file({k: f"{v:.3f}" for k, v in idx2mcd.items()},
                            os.path.join(out_dir, "idx2mcd"))
        if idx2f0:
            summary["log_f0_rmse"] = float(np.mean(list(idx2f0.values())))
            write_idx2_file({k: f"{v:.3f}" for k, v in idx2f0.items()},
                            os.path.join(out_dir, "idx2log_f0_rmse"))
        with open(os.path.join(out_dir, "overall_results.md"), "w") as f:
            f.write("# TTS results\n\n" + md_table(
                ["metric", "value"],
                [[k, f"{v:.4f}"] for k, v in summary.items()]) + "\n")
        logger.info("%s: synthesized %d utts %s", set_name, len(idx2wav),
                    summary)
        all_results[set_name] = summary
    return all_results


def lm_test_main(cfg, args, net, tokenizer, variables, name, logger):
    """LM evaluation: test-set perplexity (model/lm.py test flow)."""
    import jax
    import jax.numpy as jnp

    from speechain_tpu.models.lm import lm_loss
    from speechain_tpu.utils.reports import md_table

    result_path = cfg["result_path"]
    test_sets = {k: v for k, v in cfg["data_cfg"].items()
                 if k not in ("train", "valid")} or {"valid": None}
    all_results = {}
    for set_name in test_sets:
        loader = build_data(cfg["data_cfg"], set_name, tokenizer,
                            batch_bucket=args.batch_bucket,
                            time_bucket=args.time_bucket,
                            token_bucket=args.token_bucket)
        ppls, weights = [], []
        for batch in loader.epoch(0):
            text = jnp.asarray(batch["text"])
            text_len = jnp.asarray(batch["text_len"])
            logits, _, _ = net.apply(variables, text, text_len, train=False)
            _, metrics = lm_loss(logits, text, text_len)
            ppls.append(float(metrics["text_ppl"]))
            weights.append(batch["n_real"])
        ppl = float(np.average(ppls, weights=weights)) if ppls else None
        out_dir = os.path.join(result_path, name, set_name)
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "overall_results.md"), "w") as f:
            f.write("# LM results\n\n" + md_table(
                ["metric", "value"], [["text_ppl", f"{ppl:.4f}"]]) + "\n")
        logger.info("%s: text_ppl=%.4f", set_name, ppl)
        all_results[set_name] = dict(text_ppl=ppl)
    return all_results


def main(argv=None):
    args = parse_args(argv)
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    if args.coordinator or args.num_hosts > 1:
        assert args.coordinator and args.host_id is not None, \
            "multi-host launch needs --coordinator AND --host_id"
        from speechain_tpu.parallel import multihost
        multihost.initialize(args.coordinator, args.num_hosts, args.host_id)
    cfg = merge_config(args)
    if args.train:
        train_main(cfg, args)
    if args.test:
        from speechain_tpu.parallel import multihost
        if multihost.process_count() > 1 and not multihost.is_primary():
            return None  # decoding is single-host work; host 0 runs it
        return test_main(cfg, args)


if __name__ == "__main__":
    main()
