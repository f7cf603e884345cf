"""Import a reference-trained PyTorch checkpoint into snag_tpu params.

The reference saves ``torch.save(model.state_dict(), <data_path>/<model>/
save/<name>.pkl)`` (SNAG_MMEA/main.py:481-500).  This module maps that
state_dict onto our flax param tree so a user migrating from the reference
can evaluate / warm-start a model they already trained:

* torch ``nn.Linear.weight`` is (out, in); flax ``Dense.kernel`` is
  (in, out) — transposed on import.
* torch ``LayerNorm.weight`` -> flax ``scale``.
* The reference pads bag-of-relation features to top-1000 columns
  (src/data.py:521-538) while we size the table to the actual relation
  count; both use ``Counter.most_common`` ordering, so truncating the
  reference weight's input columns to our width is exact (the dropped
  columns only ever see zero inputs).

Covers SNAG / MEAformer / MCLEA / EVA (MSNEA keeps its own data path and
tree and is not mapped — ``strict`` raises with the unmatched leaves).

Doubles as the strongest eval-parity oracle: identical weights must give
identical rankings (tests/test_import_reference.py co-runs the reference
binary, imports its checkpoint, and compares full-rank eval metrics).
"""

from __future__ import annotations

import os.path as osp
from typing import Dict

import numpy as np

# our path (tuple of tree keys) -> (reference key fmt, transform)
_T = "transpose"      # torch Linear weight -> flax kernel
_ID = "identity"
_SLICE_IN = "slice_in_then_transpose"   # truncate ref input dim to ours

_FUSION_LAYER = {
    ("self", "query", "kernel"): ("attention.self.query.weight", _T),
    ("self", "query", "bias"): ("attention.self.query.bias", _ID),
    ("self", "key", "kernel"): ("attention.self.key.weight", _T),
    ("self", "key", "bias"): ("attention.self.key.bias", _ID),
    ("self", "value", "kernel"): ("attention.self.value.weight", _T),
    ("self", "value", "bias"): ("attention.self.value.bias", _ID),
    ("att_out", "kernel"): ("attention.output.dense.weight", _T),
    ("att_out", "bias"): ("attention.output.dense.bias", _ID),
    ("att_ln", "scale"): ("attention.output.LayerNorm.weight", _ID),
    ("att_ln", "bias"): ("attention.output.LayerNorm.bias", _ID),
    ("intermediate", "kernel"): ("intermediate.dense.weight", _T),
    ("intermediate", "bias"): ("intermediate.dense.bias", _ID),
    ("output", "kernel"): ("output.dense.weight", _T),
    ("output", "bias"): ("output.dense.bias", _ID),
    ("out_ln", "scale"): ("output.LayerNorm.weight", _ID),
    ("out_ln", "bias"): ("output.LayerNorm.bias", _ID),
}


def _ref_key_for(path):
    """Reference state_dict key + transform for one of our param paths.

    SNAG / MEAformer / MCLEA nest the shared encoder under
    ``multimodal_encoder``; EVA's tree is flat (EVA.py) — the encoder rules
    apply at either depth with the matching reference prefix."""
    keys = tuple(str(getattr(k, "key", k)) for k in path)
    if keys[0] == "multimodal_encoder":
        rest, prefix = keys[1:], "multimodal_encoder."
    else:
        rest, prefix = keys, ""

    if rest in (("entity_emb",), ("ent_embed",)):
        return f"{prefix}{rest[0]}.weight", _ID
    if rest == ("weight_raw",):
        return f"{prefix}weight_raw", _ID
    if len(rest) == 2 and rest[0].endswith("_fc"):
        if rest[1] == "kernel":
            return f"{prefix}{rest[0]}.weight", _SLICE_IN
        return f"{prefix}{rest[0]}.bias", _ID
    if rest[0] == "cross_graph_model" and len(rest) == 3:
        name, leaf = rest[1], rest[2]
        if name.startswith("gat_"):     # gat_{i} -> layer_stack.{i}
            i = name.split("_", 1)[1]
            return (f"{prefix}cross_graph_model.layer_stack.{i}.{leaf}", _ID)
        if name.startswith("gc"):       # gc1/gc2 (same names in ref GCN)
            # reference GraphConvolution.weight is (in, out) already
            return f"{prefix}cross_graph_model.{name}.{leaf}", _ID
    if rest[0] == "fusion":
        if rest[1] == "weight_raw":
            return f"{prefix}fusion.weight_raw", _ID
        if rest[1] == "weight":         # MCLEA MultiModalFusion.weight
            return f"{prefix}fusion.weight", _ID
        if rest[1].startswith("layer_"):
            i = rest[1].split("_", 1)[1]
            tail = _FUSION_LAYER.get(tuple(rest[2:]))
            if tail is not None:
                ref_tail, tf = tail
                return f"{prefix}fusion.fusion_layer.{i}.{ref_tail}", tf

    if len(keys) == 2 and keys[1] in ("log_vars", "params") and \
            keys[0].endswith(("multi_loss_layer", "multi_loss_layer_2")):
        return f"{keys[0]}.{keys[1]}", _ID
    return None, None


def import_reference_state_dict(params, state_dict: Dict[str, np.ndarray],
                                strict: bool = True):
    """Map a reference ``state_dict`` (numpy arrays) onto our param tree.

    ``params`` supplies the target structure/shapes (an initialized tree
    from ``create_train_state``).  Returns a new tree of the same
    structure.  With ``strict`` (default) every one of our leaves must
    find its reference tensor; otherwise unmatched leaves keep their
    initialized values.
    """
    import jax.tree_util as jtu

    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    missing = []

    def convert(path, leaf):
        ref_key, tf = _ref_key_for(path)
        src = sd.get(ref_key) if ref_key is not None else None
        if src is None:
            missing.append("/".join(str(getattr(p, "key", p)) for p in path))
            return leaf
        if tf == _T:
            src = src.T
        elif tf == _SLICE_IN:
            src = src.T
            if src.shape[0] != leaf.shape[0]:
                if src.shape[0] < leaf.shape[0]:
                    raise ValueError(
                        f"{ref_key}: reference input dim {src.shape[0]} < "
                        f"ours {leaf.shape[0]}")
                src = src[: leaf.shape[0]]
        if tuple(src.shape) != tuple(np.shape(leaf)):
            raise ValueError(f"{ref_key}: shape {src.shape} vs ours "
                             f"{np.shape(leaf)}")
        return np.asarray(src, dtype=np.asarray(leaf).dtype)

    out = jtu.tree_map_with_path(convert, params)
    if strict and missing:
        raise KeyError(f"no reference tensor for param(s): {missing}; "
                       f"reference keys: {sorted(sd)}")
    return out


def load_reference_checkpoint(path: str):
    """torch.load the reference .pkl into {key: numpy} (CPU, no grad)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.detach().numpy() for k, v in sd.items()}


def import_reference_checkpoint(params, path: str, strict: bool = True):
    if not osp.exists(path):
        raise FileNotFoundError(path)
    return import_reference_state_dict(params,
                                       load_reference_checkpoint(path),
                                       strict=strict)


def export_reference_state_dict(params, rel_in_dim: int = 1000,
                                template=None):
    """The reverse mapping: our param tree -> a reference ``state_dict``.

    Lets a reference user evaluate a snag_tpu-trained model in their own
    stack (``--only_test 1 --model_name_save <name>``).  ``rel_fc`` is
    zero-padded back to the reference's fixed top-1000 relation-bag width
    (load_relation always allocates 1000 columns; the extra columns only
    ever see zero inputs, so zero weights are exact).

    The reference constructs some modules unconditionally that our tree
    only materializes when used (name_fc/char_fc under ``use_surface 0``,
    the AWL head without ``--awloss``), and its ``load_state_dict`` is
    strict — pass ``template`` (any reference state_dict of the same
    config, e.g. an early ``--save_model`` checkpoint, or
    ``Model(kgs, args).state_dict()``) to fill those eval-inert keys;
    without one, load the result with ``strict=False``.
    """
    import jax.tree_util as jtu

    out = {}
    if template is not None:
        out.update({k: np.asarray(v) for k, v in template.items()})
    for path, leaf in jtu.tree_leaves_with_path(params):
        ref_key, tf = _ref_key_for(path)
        if ref_key is None:
            name = "/".join(str(getattr(p, "key", p)) for p in path)
            raise KeyError(f"no reference mapping for param {name}")
        arr = np.asarray(leaf, dtype=np.float32)
        if tf == _T:
            arr = arr.T
        elif tf == _SLICE_IN:
            if ref_key.endswith("rel_fc.weight") and arr.shape[0] < rel_in_dim:
                arr = np.concatenate(
                    [arr, np.zeros((rel_in_dim - arr.shape[0], arr.shape[1]),
                                   arr.dtype)], axis=0)
            arr = arr.T
        out[ref_key] = arr
    return out


def export_reference_checkpoint(params, path: str, rel_in_dim: int = 1000,
                                template=None):
    """torch.save our params in the reference's checkpoint format."""
    import torch

    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in
          export_reference_state_dict(params, rel_in_dim, template).items()}
    torch.save(sd, path)
    return path
