"""Checkpoint save/load + PyTorch .pth import with layout adaptation.

Reference parity:
  * ``tools/train_utils/train_utils.py:221`` checkpoint_state
    ({'epoch','it','model_state','optimizer_state','version'}) -> our
    ``save_checkpoint``/``load_checkpoint`` (flax msgpack + json meta, with
    rotation keeping max_ckpt_save_num, ``train_utils.py:201-211``);
  * ``detector3d_template.py:330-415`` shape-adaptive torch-checkpoint
    loading -> ``import_torch_state_dict`` translating torch layouts
    (OIHW conv, (O,I) linear, spconv (O,k,k,k,I) sparse conv, BN running
    stats) into our HWIO / (I,O) / (K,I,O) flax trees, by structured name
    mapping with order+shape fallback.
"""

import json
import pickle
import re
from pathlib import Path

import numpy as np

import flax
from flax import serialization


# --------------------------------------------------------------------------
# native checkpoints
# --------------------------------------------------------------------------

def save_checkpoint(path, variables, opt_state=None, epoch=0, it=0,
                    max_keep=None):
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    blob = {
        "model_state": serialization.to_bytes(variables),
        "optimizer_state": serialization.to_bytes(opt_state)
        if opt_state is not None else None,
        "epoch": epoch, "it": it,
        "version": "q3d_tpu+0.1",
    }
    with open(path, "wb") as f:
        pickle.dump(blob, f)
    if max_keep:
        ckpts = sorted(path.parent.glob("checkpoint_epoch_*.pkl"),
                       key=lambda p: p.stat().st_mtime)
        for old in ckpts[:-max_keep]:
            old.unlink(missing_ok=True)
    return path


def load_checkpoint(path, variables_template, opt_state_template=None):
    with open(path, "rb") as f:
        blob = pickle.load(f)
    variables = serialization.from_bytes(variables_template, blob["model_state"])
    opt_state = None
    if blob.get("optimizer_state") is not None and opt_state_template is not None:
        opt_state = serialization.from_bytes(opt_state_template,
                                             blob["optimizer_state"])
    return variables, opt_state, blob.get("epoch", 0), blob.get("it", 0)


def find_latest_checkpoint(ckpt_dir):
    """Auto-resume helper (reference tools/train.py:146-158): newest loadable."""
    ckpts = sorted(Path(ckpt_dir).glob("checkpoint_epoch_*.pkl"),
                   key=lambda p: p.stat().st_mtime, reverse=True)
    for c in ckpts:
        try:
            with open(c, "rb") as f:
                pickle.load(f)
            return c
        except Exception:
            continue
    return None


# --------------------------------------------------------------------------
# torch import
# --------------------------------------------------------------------------

def _flatten_tree(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten_tree(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _unflatten_tree(flat):
    out = {}
    for path, v in flat.items():
        node = out
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return out


def _torch_name_to_ours(name):
    """Translate a pcdet state-dict key into our flax path conventions:
    '.N' list indices -> '_N' suffixes; BN stat names -> flax names."""
    name = re.sub(r"\.(\d+)", r"_\1", name)
    return name


def adapt_torch_tensor(t, target_shape):
    """Find the transposition of torch tensor ``t`` matching target_shape.

    Handles: conv OIHW->HWIO, convT IOHW->HWOI, linear (O,I)->(I,O),
    spconv (O,k0..,I)->(K,I,O) (both spconv1 (k,k,k,I,O) and spconv2
    (O,k,k,k,I) layouts, mirroring the reference's version-adaptive loader),
    and pass-through for vectors.
    """
    a = np.asarray(t)
    ts = tuple(target_shape)
    if a.shape == ts:
        return a
    if a.ndim == 2 and a.T.shape == ts:                      # linear
        return a.T
    if a.ndim == 4:
        for perm in [(2, 3, 1, 0), (2, 3, 0, 1)]:            # conv / convT
            if tuple(np.transpose(a, perm).shape) == ts:
                return np.transpose(a, perm)
    if a.ndim == 5:                                          # spconv 3d
        o, k0, k1, k2, i = None, None, None, None, None
        # spconv2 layout (O, kd, kh, kw, I) -> (K, I, O)
        K = a.shape[1] * a.shape[2] * a.shape[3]
        cand = a.reshape(a.shape[0], K, a.shape[4]).transpose(1, 2, 0)
        if cand.shape == ts:
            return cand
        # spconv1 layout (kd, kh, kw, I, O) -> (K, I, O)
        K = a.shape[0] * a.shape[1] * a.shape[2]
        cand = a.reshape(K, a.shape[3], a.shape[4])
        if cand.shape == ts:
            return cand
    if a.ndim == 4:                                          # spconv 2d variants
        K = a.shape[1] * a.shape[2]
        cand = a.reshape(a.shape[0], K, a.shape[3]).transpose(1, 2, 0)
        if cand.shape == ts:
            return cand
    if a.ndim == 5 and len(ts) == 3:
        # input-lane-padded sparse conv (spconv_backbone.MIN_INPUT_LANES):
        # reference weights with I < target lanes -> zero-pad input rows
        if ts[1] > a.shape[4]:                   # spconv2 (O, k, k, k, I)
            K = a.shape[1] * a.shape[2] * a.shape[3]
            cand = a.reshape(a.shape[0], K, a.shape[4]).transpose(1, 2, 0)
            if cand.shape[0] == ts[0] and cand.shape[2] == ts[2]:
                return np.pad(cand,
                              ((0, 0), (0, ts[1] - cand.shape[1]), (0, 0)))
        if ts[1] > a.shape[3]:                   # spconv1 (k, k, k, I, O)
            K = a.shape[0] * a.shape[1] * a.shape[2]
            cand = a.reshape(K, a.shape[3], a.shape[4])
            if cand.shape[0] == ts[0] and cand.shape[2] == ts[2]:
                return np.pad(cand,
                              ((0, 0), (0, ts[1] - cand.shape[1]), (0, 0)))
    raise ValueError(f"cannot adapt torch tensor {a.shape} -> {ts}")


_LEAF_MAP = {
    # ours -> candidate torch leaf names, tried in order
    "kernel": ("weight",),
    "bias": ("bias",),
    "scale": ("weight",),       # BN gamma
    "mean": ("running_mean",),
    "var": ("running_var",),
}


def import_torch_state_dict(state_dict, variables, strict=False, logger=None):
    """Map a pcdet torch ``state_dict`` onto our variables tree.

    Strategy: normalize both sides' names (list indices, BN aliases), then
    for each of our leaves find the torch entry whose normalized name has the
    best suffix overlap AND whose tensor adapts to the right shape; warn and
    keep the initialized value otherwise (non-strict), like the reference's
    partial-load ``load_params_from_file`` (detector3d_template.py:361-384).
    """
    from .pcdet_names import to_pcdet, make_out_index

    ours = _flatten_tree(variables)
    torch_flat = {}
    for k, v in state_dict.items():
        arr = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        torch_flat[_torch_name_to_ours(k)] = arr

    out_index = make_out_index(list(ours))
    used = set()
    out = {}
    missing = []
    for path, leaf in ours.items():
        # exact-name fast path: the canonical pcdet key for this leaf
        # (shared with export_torch_state_dict) — deterministic even when
        # many tensors share a shape, unlike the suffix matcher below
        exact = to_pcdet(path, out_index)
        if exact is not None:
            norm = _torch_name_to_ours(exact)
            if norm in torch_flat and norm not in used:
                try:
                    adapted = adapt_torch_tensor(torch_flat[norm],
                                                 np.shape(leaf))
                    used.add(norm)
                    out[path] = np.asarray(adapted, np.asarray(leaf).dtype)
                    continue
                except ValueError:
                    pass
    for path, leaf in ours.items():
        if path in out:
            continue
        coll_path = [p for p in path]
        leaf_name = coll_path[-1]
        mod_path = coll_path[:-1]
        # drop the flax-internal trailing 'bn' (layers.BatchNorm nests one);
        # an EARLIER 'bn' is a real torch child name (BasicBlock2D.bn) and
        # must survive for suffix matching
        mod_tokens = list(mod_path)
        if mod_tokens and mod_tokens[-1] == "bn":
            mod_tokens = mod_tokens[:-1]
        cands = _LEAF_MAP.get(leaf_name, (leaf_name,))
        found = None
        # try progressively shorter suffixes of the module path (down to the
        # bare leaf name, where shape adaptation disambiguates)
        for start in range(0, len(mod_tokens) + 1):
            suffix = ".".join(mod_tokens[start:])
            for cand_leaf in cands:
                for tname, arr in torch_flat.items():
                    if tname in used:
                        continue
                    if not tname.endswith(
                            (suffix + "_" + cand_leaf) if suffix else cand_leaf) \
                       and not tname.endswith(
                            (suffix + "." + cand_leaf) if suffix else cand_leaf):
                        continue
                    try:
                        adapted = adapt_torch_tensor(arr, np.shape(leaf))
                    except ValueError:
                        continue
                    found = (tname, adapted)
                    break
                if found:
                    break
            if found:
                break
        if found:
            used.add(found[0])
            out[path] = np.asarray(found[1], np.asarray(leaf).dtype)
        else:
            missing.append(".".join(path))
            out[path] = leaf
    if missing and logger:
        logger.warning(f"torch import: {len(missing)} leaves kept initialized "
                       f"(first: {missing[:5]})")
    if strict and missing:
        raise KeyError(f"unmatched leaves: {missing}")
    return _unflatten_tree(out)


def load_pth_file(path):
    """Load a torch .pth checkpoint dict (CPU) and return its model state."""
    import torch
    blob = torch.load(path, map_location="cpu", weights_only=False)
    state = blob.get("model_state", blob) if isinstance(blob, dict) else blob
    return state
