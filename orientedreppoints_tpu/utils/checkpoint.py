"""Orbax checkpointing + torch pretrained-weight conversion.

Reference parity:
  * epoch checkpoints with meta (config text, CLASSES) every interval
    (mmcv checkpoint hook; tools/train.py:134-140);
  * resume/load_from (apis/train.py:179-183);
  * torchvision ResNet weight loading ('torchvision://resnet50',
    mmcv_custom/checkpoint.py:286) — implemented as an offline converter
    from a local torch .pth file into our NHWC flax tree.
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(ckpt_dir: str, step: int, state, meta: dict | None = None):
    ckpt_dir = osp.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    with ocp.CheckpointManager(ckpt_dir) as mngr:
        payload = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        mngr.save(step, args=ocp.args.StandardSave(payload))
        mngr.wait_until_finished()
    if meta:
        import json

        with open(osp.join(ckpt_dir, "meta.json"), "w") as f:
            json.dump({k: str(v) for k, v in meta.items()}, f)


def load_eval_variables(ckpt_dir: str, variables, step: int | None = None):
    """Restore only params/batch_stats for inference.

    Works against both full-TrainState checkpoints (tools/train.py /
    tools/synth_benchmark.py write params+batch_stats+opt_state+step) and
    published params-only checkpoints (tools/publish_model.py): orbax's
    StandardRestore refuses a template missing on-disk keys, so the
    partial restore goes through PyTreeRestore(partial_restore=True).

    Returns the `variables` dict with restored collections swapped in,
    and the restored step (reference: mmcv load_checkpoint's
    strict=False model-only load used by tools/test.py::main).
    """
    ckpt_dir = osp.abspath(ckpt_dir)
    template = {"params": variables["params"]}
    if variables.get("batch_stats"):
        template["batch_stats"] = variables["batch_stats"]
    with ocp.CheckpointManager(ckpt_dir) as mngr:
        step = step if step is not None else mngr.latest_step()
        restored = mngr.restore(
            step,
            args=ocp.args.PyTreeRestore(
                template,
                restore_args=ocp.checkpoint_utils.construct_restore_args(
                    template
                ),
                partial_restore=True,
            ),
        )
    out = {"params": restored["params"]}
    if restored.get("batch_stats"):
        out["batch_stats"] = restored["batch_stats"]
    return out, step


def load_checkpoint(ckpt_dir: str, state, step: int | None = None):
    ckpt_dir = osp.abspath(ckpt_dir)
    with ocp.CheckpointManager(ckpt_dir) as mngr:
        step = step if step is not None else mngr.latest_step()
        template = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        restored = mngr.restore(
            step, args=ocp.args.StandardRestore(template)
        )
    return state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        step=restored["step"],
    ), step


# ---------------------------------------------------------------------------
# torchvision ResNet -> flax tree conversion (host-side, numpy)
# ---------------------------------------------------------------------------

_STAGE_BLOCKS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 18: (2, 2, 2, 2),
                 34: (3, 4, 6, 3), 152: (3, 8, 36, 3)}


def convert_torchvision_resnet(state_dict: dict, depth: int = 50):
    """Map a torchvision ResNet state_dict to our flax params/batch_stats.

    Accepts {name: np.ndarray} (call .numpy() on torch tensors first or pass
    tensors — they are np.asarray'd).  Conv kernels OIHW -> HWIO.
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: dict = {}
    stats: dict = {}

    def conv(dst, src):
        params[dst] = {"conv": {"kernel": sd[src + ".weight"].transpose(2, 3, 1, 0)}}

    def bn(dst, src):
        params[dst]["bn"] = {
            "scale": sd[src + ".weight"],
            "bias": sd[src + ".bias"],
        }
        stats[dst] = {
            "bn": {
                "mean": sd[src + ".running_mean"],
                "var": sd[src + ".running_var"],
            }
        }

    conv("stem", "conv1")
    bn("stem", "bn1")

    bottleneck = depth >= 50
    n_convs = 3 if bottleneck else 2
    for stage, blocks in enumerate(_STAGE_BLOCKS[depth]):
        for b in range(blocks):
            name = f"layer{stage + 1}_{b}"
            src = f"layer{stage + 1}.{b}"
            entry = {}
            for ci in range(1, n_convs + 1):
                entry[f"conv{ci}"] = {
                    "conv": {
                        "kernel": sd[f"{src}.conv{ci}.weight"].transpose(2, 3, 1, 0)
                    },
                    "bn": {
                        "scale": sd[f"{src}.bn{ci}.weight"],
                        "bias": sd[f"{src}.bn{ci}.bias"],
                    },
                }
            if f"{src}.downsample.0.weight" in sd:
                entry["downsample"] = {
                    "conv": {
                        "kernel": sd[f"{src}.downsample.0.weight"].transpose(2, 3, 1, 0)
                    },
                    "bn": {
                        "scale": sd[f"{src}.downsample.1.weight"],
                        "bias": sd[f"{src}.downsample.1.bias"],
                    },
                }
            params[name] = entry
            sentry = {}
            for ci in range(1, n_convs + 1):
                sentry[f"conv{ci}"] = {
                    "bn": {
                        "mean": sd[f"{src}.bn{ci}.running_mean"],
                        "var": sd[f"{src}.bn{ci}.running_var"],
                    }
                }
            if f"{src}.downsample.0.weight" in sd:
                sentry["downsample"] = {
                    "bn": {
                        "mean": sd[f"{src}.downsample.1.running_mean"],
                        "var": sd[f"{src}.downsample.1.running_var"],
                    }
                }
            stats[name] = sentry
    return params, stats


def load_pretrained_backbone(variables, pth_path: str, depth: int = 50):
    """Overwrite the backbone subtree from a torch .pth file."""
    import torch

    sd = torch.load(pth_path, map_location="cpu", weights_only=False)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    bp, bs = convert_torchvision_resnet(sd, depth)
    variables = jax.tree_util.tree_map(lambda x: x, variables)  # shallow copy
    params = dict(variables["params"])
    stats = dict(variables["batch_stats"])
    params["backbone"] = _merge(params["backbone"], bp)
    stats["backbone"] = _merge(stats["backbone"], bs)
    return {**variables, "params": params, "batch_stats": stats}


def _merge(dst, src):
    out = dict(dst)
    for k, v in src.items():
        if k in out and isinstance(v, dict):
            out[k] = _merge(out[k], v)
        else:
            out[k] = v
    return out


# ---------------------------------------------------------------------------
# Swin pretrained conversion (timm/official swin_tiny_patch4_window7_224)
# ---------------------------------------------------------------------------


def _interp_bias_table(table: np.ndarray, dst_len: int) -> np.ndarray:
    """Bicubic-resize a relative-position bias table to a new window size.

    Mirrors the Swin-aware load_checkpoint (mmcv_custom/checkpoint.py:336-349):
    (L1, nH) -> (L2, nH) via 2D bicubic over the sqrt(L) x sqrt(L) grid.
    """
    l1, nh = table.shape
    if l1 == dst_len:
        return table
    import cv2

    s1 = int(np.sqrt(l1))
    s2 = int(np.sqrt(dst_len))
    t = table.reshape(s1, s1, nh).astype(np.float32)
    out = cv2.resize(t, (s2, s2), interpolation=cv2.INTER_CUBIC)
    return out.reshape(s2 * s2, nh)


def convert_swin_tiny(state_dict: dict, window_size: int = 7,
                      depths=(2, 2, 6, 2)):
    """Map an official Swin state_dict to our flax param tree.

    Handles: patch_embed, per-block LN/qkv/proj/MLP, downsample
    (PatchMerging), out-norms; interpolates relative_position_bias_table
    when window sizes differ.  Dense kernels transpose (out,in)->(in,out);
    patch-embed conv OIHW->HWIO.
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    p: dict = {}

    def dense(dst, src, bias=True):
        out = {"kernel": sd[src + ".weight"].T}
        if bias and src + ".bias" in sd:
            out["bias"] = sd[src + ".bias"]
        return out

    def ln(src):
        return {"scale": sd[src + ".weight"], "bias": sd[src + ".bias"]}

    p["patch_embed"] = {
        "kernel": sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0),
        "bias": sd["patch_embed.proj.bias"],
    }
    if "patch_embed.norm.weight" in sd:
        p["patch_norm"] = ln("patch_embed.norm")

    tgt_len = (2 * window_size - 1) ** 2
    for st, depth in enumerate(depths):
        for b in range(depth):
            src = f"layers.{st}.blocks.{b}"
            blk = {
                "norm1": ln(src + ".norm1"),
                "norm2": ln(src + ".norm2"),
                "attn": {
                    "qkv": dense("", src + ".attn.qkv"),
                    "proj": dense("", src + ".attn.proj"),
                    "relative_position_bias_table": _interp_bias_table(
                        sd[src + ".attn.relative_position_bias_table"],
                        tgt_len,
                    ),
                },
                "mlp_fc1": dense("", src + ".mlp.fc1"),
                "mlp_fc2": dense("", src + ".mlp.fc2"),
            }
            p[f"stage{st}_block{b}"] = blk
        if f"layers.{st}.downsample.reduction.weight" in sd:
            p[f"merge{st}"] = {
                "norm": ln(f"layers.{st}.downsample.norm"),
                "reduction": {
                    "kernel": sd[f"layers.{st}.downsample.reduction.weight"].T
                },
            }
    # out norms: official det checkpoints name them norm0..norm3
    for st in range(len(depths)):
        if f"norm{st}.weight" in sd:
            p[f"out_norm{st}"] = ln(f"norm{st}")
        elif st == len(depths) - 1 and "norm.weight" in sd:
            # classification checkpoints have a single final norm
            p[f"out_norm{st}"] = ln("norm")
    return p


def load_pretrained_swin(variables, pth_path: str, window_size: int = 7,
                         depths=(2, 2, 6, 2)):
    """Overwrite the Swin backbone subtree from an official .pth file."""
    import torch

    sd = torch.load(pth_path, map_location="cpu", weights_only=False)
    if "model" in sd:
        sd = sd["model"]
    if "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k.replace("backbone.", ""): (v.numpy() if hasattr(v, "numpy") else v)
          for k, v in sd.items()}
    bp = convert_swin_tiny(sd, window_size, depths)
    params = dict(variables["params"])
    params["backbone"] = _merge(params["backbone"], bp)
    return {**variables, "params": params}
