"""Rename parameter paths inside a saved model checkpoint.

Rebuild of reference ``speechain/pyscripts/model_para_renamer.py``: apply a
mapping of old-prefix -> new-prefix to an orbax params checkpoint, mirroring
the pretrained-model ``mapping`` mechanism (model/abs.py:171-234).
"""

from __future__ import annotations

import argparse
import os
import shutil

from speechain_tpu.utils.yamlref import load_yaml


def rename_tree(tree, mapping):
    """Rename keys by longest-prefix match on '/'-joined paths."""
    import flax

    flat = flax.traverse_util.flatten_dict(tree)
    out = {}
    for path, leaf in flat.items():
        joined = "/".join(str(p) for p in path)
        for old, new in sorted(mapping.items(), key=lambda kv: -len(kv[0])):
            if joined == old or joined.startswith(old + "/"):
                joined = new + joined[len(old):]
                break
        out[tuple(joined.split("/"))] = leaf
    return flax.traverse_util.unflatten_dict(out)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt_path", required=True,
                   help="orbax checkpoint dir containing 'params'")
    p.add_argument("--save_path", required=True)
    p.add_argument("--mapping", required=True,
                   help="yaml file of old_prefix: new_prefix pairs")
    args = p.parse_args(argv)

    import orbax.checkpoint as ocp

    mapping = load_yaml(args.mapping)
    ckptr = ocp.StandardCheckpointer()
    payload = ckptr.restore(os.path.abspath(args.ckpt_path), None)
    payload["params"] = rename_tree(payload["params"], mapping)
    if os.path.exists(args.save_path):
        shutil.rmtree(args.save_path)
    ckptr.save(os.path.abspath(args.save_path), payload)
    ckptr.wait_until_finished()
    print(f"renamed params saved to {args.save_path}")


if __name__ == "__main__":
    main()
