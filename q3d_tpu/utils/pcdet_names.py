"""Canonical flax-path <-> pcdet state-dict name mapping.

One source of truth for both directions:
  * ``export_torch_state_dict`` — write our variables as a pcdet-shaped
    ``model_state`` dict (reference checkpoint format,
    ``train_utils.py:221-237`` {'model_state': ...}) with torch weight
    layouts (conv OIHW, convT IOHW, spconv2 (O,kd,kh,kw,I), BN
    weight/bias/running_mean/running_var);
  * ``import_torch_state_dict`` (utils/checkpoint.py) uses ``to_pcdet`` as
    an exact-name fast path before its fuzzy suffix matcher, so
    reference-named checkpoints map deterministically even when many
    tensors share a shape.

Coverage: the CenterPoint/SECOND family modules (MeanVFE,
VoxelBackBone8x/VoxelResBackBone8x via post_act_block + SparseBasicBlock
naming — reference spconv_backbone.py:20-295, BaseBEVBackbone blocks /
deblocks — base_bev_backbone.py:30-60, CenterHead shared_conv +
SeparateHead branches — center_head.py:12-46).  Uncovered modules return
None and fall back to the fuzzy matcher.
"""

import re

import numpy as np

# leaf-name translation: ours -> torch
_LEAF = {"kernel": "weight", "weight": "weight", "bias": "bias",
         "scale": "weight", "mean": "running_mean", "var": "running_var"}


def _module_rules(module, toks):
    """toks: our module-path tokens (bn dropped) inside ``module``.
    Returns the pcdet module path string, or None."""
    t = ".".join(toks)
    if module == "backbone_3d":
        m = re.fullmatch(r"conv_(input|out)\.conv", t)
        if m:
            return f"conv_{m.group(1)}.0"
        m = re.fullmatch(r"conv_(input|out)\.norm", t)
        if m:
            return f"conv_{m.group(1)}.1"
        m = re.fullmatch(r"conv(\d)_(\d+)\.conv", t)
        if m:
            return f"conv{m.group(1)}.{m.group(2)}.0"
        m = re.fullmatch(r"conv(\d)_(\d+)\.norm", t)
        if m:
            return f"conv{m.group(1)}.{m.group(2)}.1"
        m = re.fullmatch(r"conv(\d)_(\d+)\.(conv1|conv2|bn1|bn2)", t)
        if m:
            return f"conv{m.group(1)}.{m.group(2)}.{m.group(3)}"
        return None
    if module == "backbone_2d":
        m = re.fullmatch(r"blocks_(\d+)\.conv(\d+)", t)
        if m:
            return f"blocks.{m.group(1)}.{1 + 3 * int(m.group(2))}"
        m = re.fullmatch(r"blocks_(\d+)\.norm(\d+)", t)
        if m:
            return f"blocks.{m.group(1)}.{2 + 3 * int(m.group(2))}"
        m = re.fullmatch(r"deblocks_(\d+)\.deconv", t)
        if m:
            return f"deblocks.{m.group(1)}.0"
        m = re.fullmatch(r"deblocks_(\d+)\.norm", t)
        if m:
            return f"deblocks.{m.group(1)}.1"
        return None
    if module == "dense_head":
        if t == "shared_conv":
            return "shared_conv.0"
        if t == "shared_norm":
            return "shared_conv.1"
        m = re.fullmatch(r"heads_list_(\d+)\.([a-z_]+?)_(\d+)", t)
        if m:
            return f"heads_list.{m.group(1)}.{m.group(2)}.{m.group(3)}.0"
        m = re.fullmatch(r"heads_list_(\d+)\.([a-z_]+?)_(\d+)_norm", t)
        if m:
            return f"heads_list.{m.group(1)}.{m.group(2)}.{m.group(3)}.1"
        m = re.fullmatch(r"heads_list_(\d+)\.([a-z_]+?)_out", t)
        if m:
            # final branch conv: index = (#hidden convs); resolved by the
            # caller via out_index (sibling scan)
            return ("OUT", m.group(1), m.group(2))
        return None
    return None


def to_pcdet(path, out_index=None):
    """Our flattened variable path (tuple of strings ending in the leaf
    name) -> pcdet state-dict key, or None when no rule covers it.

    out_index: callable (head, branch) -> int for SeparateHead final convs
    (their pcdet index equals the hidden-conv count of that branch)."""
    if len(path) < 3:
        return None
    coll, module, *mod_toks, leaf = path
    if coll not in ("params", "batch_stats"):
        return None
    tl = _LEAF.get(leaf)
    if tl is None:
        return None
    toks = [t for t in mod_toks if t != "bn"]
    r = _module_rules(module, toks)
    if r is None:
        return None
    if isinstance(r, tuple):                     # SeparateHead out conv
        _, head, branch = r
        idx = out_index(head, branch) if out_index else 1
        r = f"heads_list.{head}.{branch}.{idx}"
    return f"{module}.{r}.{tl}"


def make_out_index(flat_paths):
    """Resolver for SeparateHead final-conv indices: #hidden convs of the
    branch (= pcdet nn.Sequential position of the output conv)."""
    counts = {}
    for path in flat_paths:
        if len(path) < 4 or path[1] != "dense_head":
            continue
        mh = re.fullmatch(r"heads_list_(\d+)", path[2])
        mb = re.fullmatch(r"([a-z_]+?)_(\d+)", path[3])
        if mh and mb and path[-1] in ("kernel", "weight"):
            key = (mh.group(1), mb.group(1))
            counts[key] = max(counts.get(key, 0), int(mb.group(2)) + 1)
    return lambda head, branch: counts.get((head, branch), 1)


def to_torch_layout(arr, leaf_torch_name, spconv_spatial=None):
    """Our array -> the torch layout pcdet stores.

    conv/convT (kh,kw,A,B) -> (B,A,kh,kw)  [conv: A=I,B=O -> OIHW;
    convT: A=O,B=I -> IOHW — the same transpose serves both];
    spconv (K,I,O) -> spconv2 (O, kd,kh,kw, I); vectors pass through."""
    a = np.asarray(arr)
    if leaf_torch_name != "weight" or a.ndim == 1:
        return a
    if a.ndim == 4:
        return np.ascontiguousarray(a.transpose(3, 2, 0, 1))
    if a.ndim == 3:                              # sparse conv (K, I, O)
        K, I, O = a.shape
        dims = spconv_spatial or {27: (3, 3, 3), 9: (3, 3),
                                  3: (3, 1, 1), 1: (1, 1, 1)}[K]
        return np.ascontiguousarray(
            a.transpose(2, 0, 1).reshape((O,) + tuple(dims) + (I,)))
    if a.ndim == 2:                              # linear (I, O) -> (O, I)
        return np.ascontiguousarray(a.T)
    return a


def export_torch_state_dict(variables):
    """Our variables tree -> pcdet-shaped {name: np.ndarray} model_state.

    Leaves without a naming rule are skipped (returned in the second
    element for the caller to inspect)."""
    from .checkpoint import _flatten_tree
    flat = _flatten_tree(variables)
    out_index = make_out_index(list(flat))
    state, skipped = {}, []
    for path, leaf in flat.items():
        key = to_pcdet(path, out_index)
        if key is None:
            skipped.append(".".join(path))
            continue
        tl = key.rsplit(".", 1)[1]
        state[key] = to_torch_layout(leaf, tl)
    return state, skipped
