"""Torch checkpoint -> flax params converter.

Maps the reference's state-dict naming (DetrForSceneGraphGeneration /
DeformableDetrForObjectDetection, HF-style modules; see
model/deformable_detr.py + model/egtr.py) onto this package's flax tree so
released EGTR checkpoints load directly.

Conventions:
- torch Linear weight [out, in]  -> flax Dense kernel [in, out] (transpose)
- torch Conv2d weight [O, I, H, W] -> flax Conv kernel [H, W, I, O]
- LayerNorm/GroupNorm weight -> scale
- Lightning checkpoints carry a leading ``model.`` prefix
  (evaluate_egtr.py:236-240) which is stripped.

The input is a plain ``{name: np.ndarray}`` dict — load a ``.ckpt`` /
``pytorch_model.bin`` with ``torch.load(..., map_location="cpu")`` and call
``{k: v.numpy() for k, v in sd.items()}``; torch itself is not required
here.
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np

from ..config import EgtrConfig


def _t(w):  # torch Linear -> flax Dense
    return np.ascontiguousarray(np.transpose(w))


def _conv(w):  # OIHW -> HWIO
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def strip_prefix(sd: Dict[str, np.ndarray],
                 prefixes=("model.",)) -> Dict[str, np.ndarray]:
    """Strip one leading Lightning ``model.`` prefix if every key has it."""
    for p in prefixes:
        if all(k.startswith(p) for k in sd):
            sd = {k[len(p):]: v for k, v in sd.items()}
    return sd


def _set(tree: dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


_LAYER_BLOCK_RE = re.compile(r"layer(\d)\.(\d+)\.")


def _convert_resnet(sd: Dict[str, np.ndarray], out: dict, src_prefix: str,
                    dst: Tuple[str, ...]):
    """timm/torchvision resnet50 keys -> ResNet50 flax tree."""
    def put(src, path, fn=lambda x: x):
        key = src_prefix + src
        if key in sd:
            _set(out, dst + path, fn(sd[key]))

    put("conv1.weight", ("conv1", "kernel"), _conv)
    for n in ("weight", "bias", "running_mean", "running_var"):
        put(f"bn1.{n}", ("bn1", n))
    # block counts are inferred from the keys present (any sub-key of the
    # block counts), so the same map covers every depth of the family
    # (resnet50 3-4-6-3, resnet101 3-4-23-3) and partial state dicts
    n_blocks_of = {1: 0, 2: 0, 3: 0, 4: 0}
    for key in sd:
        if key.startswith(src_prefix):
            m = _LAYER_BLOCK_RE.match(key[len(src_prefix):])
            if m:
                stage, b = int(m.group(1)), int(m.group(2))
                if stage in n_blocks_of:
                    n_blocks_of[stage] = max(n_blocks_of[stage], b + 1)
    for stage, n_blocks in n_blocks_of.items():
        for b in range(n_blocks):
            base = f"layer{stage}.{b}."
            name = f"layer{stage}_{b}"
            for ci in (1, 2, 3):
                put(base + f"conv{ci}.weight", (name, f"conv{ci}", "kernel"),
                    _conv)
                for n in ("weight", "bias", "running_mean", "running_var"):
                    put(base + f"bn{ci}.{n}", (name, f"bn{ci}", n))
            put(base + "downsample.0.weight", (name, "downsample_conv",
                                               "kernel"), _conv)
            for n in ("weight", "bias", "running_mean", "running_var"):
                put(base + f"downsample.1.{n}", (name, "downsample_bn", n))


def _convert_msda(sd, out, src: str, dst: Tuple[str, ...]):
    for lin in ("sampling_offsets", "attention_weights", "value_proj",
                "output_proj"):
        if f"{src}.{lin}.weight" in sd:
            _set(out, dst + (lin, "kernel"), _t(sd[f"{src}.{lin}.weight"]))
            _set(out, dst + (lin, "bias"), sd[f"{src}.{lin}.bias"])


def _convert_ln(sd, out, src: str, dst: Tuple[str, ...]):
    if f"{src}.weight" in sd:
        _set(out, dst + ("scale",), sd[f"{src}.weight"])
        _set(out, dst + ("bias",), sd[f"{src}.bias"])


def _convert_linear(sd, out, src: str, dst: Tuple[str, ...]):
    if f"{src}.weight" in sd:
        _set(out, dst + ("kernel",), _t(sd[f"{src}.weight"]))
        if f"{src}.bias" in sd:
            _set(out, dst + ("bias",), sd[f"{src}.bias"])


def _convert_mlp(sd, out, src: str, dst: Tuple[str, ...], n_layers: int = 3):
    for j in range(n_layers):
        _convert_linear(sd, out, f"{src}.layers.{j}", dst + (f"layers_{j}",))


def convert_detr_state_dict(sd: Dict[str, np.ndarray],
                            cfg: EgtrConfig) -> dict:
    """Convert a reference EGTR / detector state dict to this package's
    ``{'params': ...}`` tree. Missing pieces are simply absent — merge with
    a fresh init via ``checkpoint.merge_pretrained``."""
    sd = strip_prefix(sd)
    p: dict = {}

    # ---- backbone (model.backbone.conv_encoder.model.*) ----
    _convert_resnet(sd, p, "model.backbone.conv_encoder.model.",
                    ("model", "backbone"))

    # ---- input projections ----
    for lvl in range(cfg.num_feature_levels):
        w = f"model.input_proj.{lvl}.0.weight"
        if w in sd:
            _set(p, ("model", f"input_proj_{lvl}_conv", "kernel"),
                 _conv(sd[w]))
            _set(p, ("model", f"input_proj_{lvl}_conv", "bias"),
                 sd[f"model.input_proj.{lvl}.0.bias"])
            _set(p, ("model", f"input_proj_{lvl}_norm", "scale"),
                 sd[f"model.input_proj.{lvl}.1.weight"])
            _set(p, ("model", f"input_proj_{lvl}_norm", "bias"),
                 sd[f"model.input_proj.{lvl}.1.bias"])

    # ---- queries / refs / level embed ----
    if "model.query_position_embeddings.weight" in sd:
        _set(p, ("model", "query_position_embeddings"),
             sd["model.query_position_embeddings.weight"])
    _convert_linear(sd, p, "model.reference_points",
                    ("model", "reference_points"))
    if "model.level_embed" in sd:
        _set(p, ("model", "level_embed"), sd["model.level_embed"])

    # ---- learned 50x50 position embedding (deformable_detr.py:880-906;
    #      lives under the torch backbone wrapper) ----
    pe = "model.backbone.position_embedding."
    if pe + "row_embeddings.weight" in sd:
        _set(p, ("model", "row_embeddings"),
             sd[pe + "row_embeddings.weight"])
        _set(p, ("model", "column_embeddings"),
             sd[pe + "column_embeddings.weight"])

    # ---- two-stage proposal machinery (deformable_detr.py:2306-2343) ----
    _convert_linear(sd, p, "model.enc_output", ("model", "enc_output"))
    _convert_ln(sd, p, "model.enc_output_norm", ("model", "enc_output_norm"))
    _convert_linear(sd, p, "model.pos_trans", ("model", "pos_trans"))
    _convert_ln(sd, p, "model.pos_trans_norm", ("model", "pos_trans_norm"))

    # ---- encoder ----
    for i in range(cfg.encoder_layers):
        src = f"model.encoder.layers.{i}"
        dst = ("model", f"encoder_layer_{i}")
        _convert_msda(sd, p, f"{src}.self_attn", dst + ("self_attn",))
        _convert_ln(sd, p, f"{src}.self_attn_layer_norm",
                    dst + ("self_attn_layer_norm",))
        _convert_ln(sd, p, f"{src}.final_layer_norm",
                    dst + ("final_layer_norm",))
        _convert_linear(sd, p, f"{src}.fc1", dst + ("fc1",))
        _convert_linear(sd, p, f"{src}.fc2", dst + ("fc2",))

    # ---- decoder ----
    for i in range(cfg.decoder_layers):
        src = f"model.decoder.layers.{i}"
        dst = ("model", f"decoder_layer_{i}")
        for lin in ("q_proj", "k_proj", "v_proj", "out_proj"):
            _convert_linear(sd, p, f"{src}.self_attn.{lin}",
                            dst + ("self_attn", lin))
        _convert_msda(sd, p, f"{src}.encoder_attn", dst + ("encoder_attn",))
        for ln in ("self_attn_layer_norm", "encoder_attn_layer_norm",
                   "final_layer_norm"):
            _convert_ln(sd, p, f"{src}.{ln}", dst + (ln,))
        _convert_linear(sd, p, f"{src}.fc1", dst + ("fc1",))
        _convert_linear(sd, p, f"{src}.fc2", dst + ("fc2",))

    # ---- detection heads (shared list or per-layer clones); two-stage
    #      appends one extra head for proposal scoring
    #      (deformable_detr.py:2426-2443) ----
    num_pred = cfg.decoder_layers + (1 if cfg.two_stage else 0)
    head_count = num_pred if (cfg.with_box_refine or cfg.two_stage) else 1
    for idx in range(head_count):
        _convert_linear(sd, p, f"class_embed.{idx}",
                        ("model", f"class_embed_{idx}"))
        _convert_mlp(sd, p, f"bbox_embed.{idx}",
                     ("model", f"bbox_embed_{idx}"))

    # ---- EGTR relation head ----
    rh = ("relation_head",)
    for i in range(cfg.decoder_layers):
        _convert_linear(sd, p, f"proj_q.{i}", rh + (f"proj_q_{i}",))
        _convert_linear(sd, p, f"proj_k.{i}", rh + (f"proj_k_{i}",))
    _convert_linear(sd, p, "final_sub_proj", rh + ("final_sub_proj",))
    _convert_linear(sd, p, "final_obj_proj", rh + ("final_obj_proj",))
    if "rel_predictor_gate.weight" in sd:
        _set(p, rh + ("rel_predictor_gate_kernel",),
             _t(sd["rel_predictor_gate.weight"]))
        _set(p, rh + ("rel_predictor_gate_bias",),
             sd["rel_predictor_gate.bias"])
    if "rel_predictor.layers.0.weight" in sd:
        _set(p, rh + ("rel_predictor_layers_0_kernel",),
             _t(sd["rel_predictor.layers.0.weight"]))
        _set(p, rh + ("rel_predictor_layers_0_bias",),
             sd["rel_predictor.layers.0.bias"])
        for j in (1, 2):
            _convert_linear(sd, p, f"rel_predictor.layers.{j}",
                            rh + (f"rel_predictor_layers_{j}",))
    if "connectivity_layer.layers.0.weight" in sd:
        _set(p, rh + ("connectivity_layers_0_kernel",),
             _t(sd["connectivity_layer.layers.0.weight"]))
        _set(p, rh + ("connectivity_layers_0_bias",),
             sd["connectivity_layer.layers.0.bias"])
        for j in (1, 2):
            _convert_linear(sd, p, f"connectivity_layer.layers.{j}",
                            rh + (f"connectivity_layers_{j}",))

    # ---- frequency-bias buffers ----
    if "rel_dist" in sd:
        _set(p, ("rel_dist",), sd["rel_dist"])
    if "triplet_dist" in sd:
        _set(p, ("triplet_dist",), sd["triplet_dist"])

    return {"params": p}


def convert_backbone_state_dict(sd: Dict[str, np.ndarray],
                                root: Tuple[str, ...] = ("model", "backbone")
                                ) -> dict:
    """Convert a RAW timm/torchvision ResNet-50 state dict (keys like
    ``conv1.weight``, ``layer1.0.bn1.running_mean``) to a partial
    ``{'params': {<root>: ...}}`` tree.

    This is the reference's backbone bootstrap: both drivers load
    ``{backbone_dirpath}/{backbone}.pt`` straight into ``model.backbone``
    (reference train_egtr.py:255-260, pretrain_detr.py:72-74). ``root``
    is ("model", "backbone") for the EGTR wrapper tree and ("backbone",)
    for a bare DeformableDetrBase. Merge with a fresh init via
    ``checkpoint.merge_pretrained``; from-scratch runs pass
    ``initialized_paths=[]`` to the optimizer, matching the reference's
    ``initialized_keys = []``."""
    p: dict = {}
    _convert_resnet(sd, p, "", tuple(root))
    if not p:
        raise ValueError(
            "state dict contains no recognizable ResNet-50 keys "
            "(expected raw timm/torchvision names like 'conv1.weight')")
    return {"params": p}
