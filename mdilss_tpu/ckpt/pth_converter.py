"""PyTorch .pth.tar <-> pytree converter.

Maps the reference checkpoints' exact key grammar (SURVEY.md §2.6; e.g.
`module.encoder.layers.3.parallel_conv_1.0.weight`,
`module.encoder.layers.3.bns_1.1.running_mean`, `module.decoder.2.output_conv.bias`)
onto this framework's param/state pytrees, with layout transforms:

  * Conv2d weight   OIHW             -> HWIO
  * ConvTranspose2d (in,out,kH,kW)   -> HWIO (I=in, O=out), unflipped
  * BatchNorm weight/bias            -> params scale/bias
  * BatchNorm running_mean/var       -> BNState (per-task slices stacked [T,C])
  * `module.` DataParallel prefixes stripped; `num_batches_tracked` ignored.

The mapping is generated *structurally* (walking the model plan), not by
regexing keys, and is bidirectional: `convert_state_dict` imports torch
checkpoints; `export_state_dict` reproduces a reference-format state dict for
round-trip tests and interop.

Works on plain dict[str, np.ndarray]; reading the actual torch pickle file
(`load_pth_tar`) uses torch only if available, so the core framework has no
torch dependency.
"""
from __future__ import annotations

from typing import Any, Callable

import numpy as np
import jax.numpy as jnp

from ..models.topology import DECODER_PLAN, ENCODER_PLAN
from ..ops.norm import BNState

# ---------------------------------------------------------------------------
# Per-layer entry descriptors
# ---------------------------------------------------------------------------
# Each entry: (torch_prefix, kind, set_path)
#   kind: "conv" | "conv_t" | "bn" (plain) | "bn_t{t}" handled via task arg


def _conv_oihw_to_hwio(a: np.ndarray) -> np.ndarray:
    return np.transpose(a, (2, 3, 1, 0))


def _convt_torch_to_hwio(a: np.ndarray) -> np.ndarray:
    # (in, out, kh, kw) -> (kh, kw, in, out)
    return np.transpose(a, (2, 3, 0, 1))


def _hwio_to_convt(a: np.ndarray) -> np.ndarray:
    # (kh, kw, in, out) -> (in, out, kh, kw)
    return np.transpose(a, (2, 3, 0, 1))


def _hwio_to_conv(a: np.ndarray) -> np.ndarray:
    # (kh, kw, in, out) -> (out, in, kh, kw)
    return np.transpose(a, (3, 2, 0, 1))


class _SD:
    """Accessor over a torch state dict with module.-prefix tolerance."""

    def __init__(self, sd: dict[str, np.ndarray]):
        self.sd = {k.removeprefix("module."): np.asarray(v) for k, v in sd.items()}
        self.used: set[str] = set()

    def get(self, key: str) -> np.ndarray:
        self.used.add(key)
        return self.sd[key]

    def has(self, key: str) -> bool:
        return key in self.sd


def _import_conv(sd: _SD, prefix: str, transposed: bool) -> dict:
    w = sd.get(f"{prefix}.weight")
    return {
        "w": jnp.asarray(_convt_torch_to_hwio(w) if transposed else _conv_oihw_to_hwio(w)),
        "b": jnp.asarray(sd.get(f"{prefix}.bias")),
    }


def _import_bn(sd: _SD, prefix: str, tasks: list[int] | None):
    """tasks=None: plain BN at `prefix`; else stack `prefix.{t}` over tasks."""
    if tasks is None:
        params = {"scale": jnp.asarray(sd.get(f"{prefix}.weight")),
                  "bias": jnp.asarray(sd.get(f"{prefix}.bias"))}
        state = BNState(mean=jnp.asarray(sd.get(f"{prefix}.running_mean")),
                        var=jnp.asarray(sd.get(f"{prefix}.running_var")))
        return params, state
    scale = np.stack([sd.get(f"{prefix}.{t}.weight") for t in tasks])
    bias = np.stack([sd.get(f"{prefix}.{t}.bias") for t in tasks])
    mean = np.stack([sd.get(f"{prefix}.{t}.running_mean") for t in tasks])
    var = np.stack([sd.get(f"{prefix}.{t}.running_var") for t in tasks])
    return (
        {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)},
        BNState(mean=jnp.asarray(mean), var=jnp.asarray(var)),
    )


def _import_stacked_conv1x1(sd: _SD, prefix: str, tasks: list[int]) -> dict:
    w = np.stack([_conv_oihw_to_hwio(sd.get(f"{prefix}.{t}.weight")) for t in tasks])
    b = np.stack([sd.get(f"{prefix}.{t}.bias") for t in tasks])
    return {"w": jnp.asarray(w), "b": jnp.asarray(b)}


def _stack_trees(trees: list):
    import jax

    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def _import_nb(sd: _SD, pre: str, rap: bool, tasks: list[int] | None):
    """One non-bottleneck-1d (or RAP) block at torch prefix `pre`."""
    if rap:
        bn1_p, bn1_s = _import_bn(sd, f"{pre}.bns_1", tasks)
        bn2_p, bn2_s = _import_bn(sd, f"{pre}.bns_2", tasks)
        p = {
            "conv3x1_1": _import_conv(sd, f"{pre}.conv3x1_1", False),
            "conv1x3_1": _import_conv(sd, f"{pre}.conv1x3_1", False),
            "rap1": _import_stacked_conv1x1(sd, f"{pre}.parallel_conv_1", tasks),
            "bns1": bn1_p,
            "conv3x1_2": _import_conv(sd, f"{pre}.conv3x1_2", False),
            "conv1x3_2": _import_conv(sd, f"{pre}.conv1x3_2", False),
            "rap2": _import_stacked_conv1x1(sd, f"{pre}.parallel_conv_2", tasks),
            "bns2": bn2_p,
        }
        return p, {"bns1": bn1_s, "bns2": bn2_s}
    bn1_p, bn1_s = _import_bn(sd, f"{pre}.bn1", None)
    bn2_p, bn2_s = _import_bn(sd, f"{pre}.bn2", None)
    p = {
        "conv3x1_1": _import_conv(sd, f"{pre}.conv3x1_1", False),
        "conv1x3_1": _import_conv(sd, f"{pre}.conv1x3_1", False),
        "bn1": bn1_p,
        "conv3x1_2": _import_conv(sd, f"{pre}.conv3x1_2", False),
        "conv1x3_2": _import_conv(sd, f"{pre}.conv1x3_2", False),
        "bn2": bn2_p,
    }
    return p, {"bn1": bn1_s, "bn2": bn2_s}


def _import_down(sd: _SD, pre: str, bn_name: str, tasks: list[int] | None):
    bn_p, bn_s = _import_bn(sd, f"{pre}.{bn_name}", tasks)
    return {"conv": _import_conv(sd, f"{pre}.conv", False), "bn": bn_p}, {"bn": bn_s}


def _import_encoder(sd: _SD, *, rap: bool, nb_tasks: int | None):
    from ..models.topology import GROUP128_DILATIONS

    tasks = list(range(nb_tasks)) if nb_tasks is not None else None
    bn_ini = "bn_ini" if tasks is not None else "bn"
    init_p, init_s = _import_down(sd, "encoder.initial_block", bn_ini, tasks)
    down1_p, down1_s = _import_down(sd, "encoder.layers.0", bn_ini, tasks)
    g64 = [_import_nb(sd, f"encoder.layers.{i}", rap, tasks) for i in range(1, 6)]
    down2_p, down2_s = _import_down(sd, "encoder.layers.6", bn_ini, tasks)
    # layers 7..14 = [rep 0: d2 d4 d8 d16][rep 1: d2 d4 d8 d16]
    g128_p, g128_s = {}, {}
    for j, d in enumerate(GROUP128_DILATIONS):
        blocks = [_import_nb(sd, f"encoder.layers.{7 + 4 * rep + j}", rap, tasks) for rep in range(2)]
        g128_p[f"d{d}"] = _stack_trees([p for p, _ in blocks])
        g128_s[f"d{d}"] = _stack_trees([s for _, s in blocks])
    enc_p = {
        "initial": init_p, "down1": down1_p,
        "group64": _stack_trees([p for p, _ in g64]),
        "down2": down2_p, "group128": g128_p,
    }
    enc_s = {
        "initial": init_s, "down1": down1_s,
        "group64": _stack_trees([s for _, s in g64]),
        "down2": down2_s, "group128": g128_s,
    }
    return enc_p, enc_s


def _import_up(sd: _SD, pre: str):
    bn_p, bn_s = _import_bn(sd, f"{pre}.bn", None)
    return {"conv": _import_conv(sd, f"{pre}.conv", True), "bn": bn_p}, {"bn": bn_s}


def _import_decoder(sd: _SD, prefix: str):
    up1_p, up1_s = _import_up(sd, f"{prefix}.layers.0")
    g64 = [_import_nb(sd, f"{prefix}.layers.{j}", False, None) for j in (1, 2)]
    up2_p, up2_s = _import_up(sd, f"{prefix}.layers.3")
    g16 = [_import_nb(sd, f"{prefix}.layers.{j}", False, None) for j in (4, 5)]
    return (
        {
            "up1": up1_p,
            "group64": _stack_trees([p for p, _ in g64]),
            "up2": up2_p,
            "group16": _stack_trees([p for p, _ in g16]),
            "output_conv": _import_conv(sd, f"{prefix}.output_conv", True),
        },
        {
            "up1": up1_s,
            "group64": _stack_trees([s for _, s in g64]),
            "up2": up2_s,
            "group16": _stack_trees([s for _, s in g16]),
        },
    )


# Head naming per model kind: list of torch decoder prefixes, index = our head.
_HEAD_PREFIXES: dict[str, Callable[[int], list[str]]] = {
    # erfnet_RA_parallel / erfnet_multi_task: decoder.{t} ModuleList
    "rap": lambda nb: [f"decoder.{t}" for t in range(nb)],
    "multi_task": lambda nb: [f"decoder.{t}" for t in range(nb)],
    # erfnet.py single decoder
    "erfnet": lambda nb: ["decoder"],
    # erfnet_ftp1.py: decoder_old, decoder_new (reference erfnet_ftp1.py:139-141)
    "ftp1": lambda nb: ["decoder_old", "decoder_new"],
    # erfnet_ftp2.py: decoder_old1, decoder_old2, decoder_new (erfnet_ftp2.py:139-143)
    "ftp2": lambda nb: ["decoder_old1", "decoder_old2", "decoder_new"],
}


def convert_state_dict(
    sd: dict[str, Any], *, kind: str, nb_tasks: int = 1
) -> tuple[dict, dict]:
    """Torch state dict (numpy-valued) -> (params, state) pytrees.

    kind: "rap" | "erfnet" | "multi_task" | "ftp1" | "ftp2".
    """
    acc = _SD(sd)
    rap = kind == "rap"
    enc_p, enc_s = _import_encoder(acc, rap=rap, nb_tasks=nb_tasks if rap else None)
    heads = _HEAD_PREFIXES[kind](nb_tasks)
    decs = [_import_decoder(acc, h) for h in heads]
    if kind == "erfnet":
        params = {"encoder": enc_p, "decoder": decs[0][0]}
        state = {"encoder": enc_s, "decoder": decs[0][1]}
    else:
        params = {"encoder": enc_p, "decoders": [p for p, _ in decs]}
        state = {"encoder": enc_s, "decoders": [s for _, s in decs]}
    return params, state


# ---------------------------------------------------------------------------
# Export (pytree -> torch-format state dict), for round-trips and interop
# ---------------------------------------------------------------------------

def _export_conv(out: dict, prefix: str, p: dict, transposed: bool):
    w = np.asarray(p["w"])
    out[f"{prefix}.weight"] = _hwio_to_convt(w) if transposed else _hwio_to_conv(w)
    out[f"{prefix}.bias"] = np.asarray(p["b"])


def _export_bn(out: dict, prefix: str, p: dict, s: BNState, tasks: list[int] | None):
    # num_batches_tracked is part of torch BatchNorm2d's state dict, so a
    # strict=True load of the exported file through the reference nn.Module
    # requires it; its VALUE is unused at the reference's default momentum
    # (torch only reads it when momentum=None), so 0 is faithful enough.
    nbt = np.asarray(0, np.int64)
    if tasks is None:
        out[f"{prefix}.weight"] = np.asarray(p["scale"])
        out[f"{prefix}.bias"] = np.asarray(p["bias"])
        out[f"{prefix}.running_mean"] = np.asarray(s.mean)
        out[f"{prefix}.running_var"] = np.asarray(s.var)
        out[f"{prefix}.num_batches_tracked"] = nbt
    else:
        for t in tasks:
            out[f"{prefix}.{t}.weight"] = np.asarray(p["scale"][t])
            out[f"{prefix}.{t}.bias"] = np.asarray(p["bias"][t])
            out[f"{prefix}.{t}.running_mean"] = np.asarray(s.mean[t])
            out[f"{prefix}.{t}.running_var"] = np.asarray(s.var[t])
            out[f"{prefix}.{t}.num_batches_tracked"] = nbt


def _index_tree(tree, idx):
    import jax

    return jax.tree.map(lambda a: a[idx], tree)


def _enc_block(enc_p, enc_s, i: int):
    from ..models.topology import encoder_layer_address

    seg, idx = encoder_layer_address(i)
    p, s = enc_p[seg], enc_s[seg]
    if seg == "group64":
        return _index_tree(p, idx), _index_tree(s, idx)
    if seg == "group128":
        rep, dkey = idx
        return _index_tree(p[dkey], rep), _index_tree(s[dkey], rep)
    return p, s


def _dec_block(dec_p, dec_s, j: int):
    from ..models.topology import decoder_layer_address

    seg, idx = decoder_layer_address(j)
    p, s = dec_p[seg], dec_s[seg]
    if idx is None:
        return p, s
    return _index_tree(p, idx), _index_tree(s, idx)


def _export_nb(out, pre: str, p, s, rap: bool, tasks):
    _export_conv(out, f"{pre}.conv3x1_1", p["conv3x1_1"], False)
    _export_conv(out, f"{pre}.conv1x3_1", p["conv1x3_1"], False)
    if rap:
        for t in tasks:
            _export_conv(out, f"{pre}.parallel_conv_1.{t}",
                         {"w": p["rap1"]["w"][t], "b": p["rap1"]["b"][t]}, False)
            _export_conv(out, f"{pre}.parallel_conv_2.{t}",
                         {"w": p["rap2"]["w"][t], "b": p["rap2"]["b"][t]}, False)
        _export_bn(out, f"{pre}.bns_1", p["bns1"], s["bns1"], tasks)
    else:
        _export_bn(out, f"{pre}.bn1", p["bn1"], s["bn1"], None)
    _export_conv(out, f"{pre}.conv3x1_2", p["conv3x1_2"], False)
    _export_conv(out, f"{pre}.conv1x3_2", p["conv1x3_2"], False)
    if rap:
        _export_bn(out, f"{pre}.bns_2", p["bns2"], s["bns2"], tasks)
    else:
        _export_bn(out, f"{pre}.bn2", p["bn2"], s["bn2"], None)


def export_state_dict(params, state, *, kind: str, prefix: str = "") -> dict[str, np.ndarray]:
    """(params, state) -> reference-format flat state dict (no module. prefix
    unless `prefix="module."` is passed)."""
    out: dict[str, np.ndarray] = {}
    rap = kind == "rap"
    enc_p, enc_s = params["encoder"], state["encoder"]
    if rap:
        nb = enc_p["initial"]["bn"]["scale"].shape[0]
        tasks = list(range(nb))
        bn_ini = "bn_ini"
    else:
        tasks = None
        bn_ini = "bn"
    _export_conv(out, "encoder.initial_block.conv", enc_p["initial"]["conv"], False)
    _export_bn(out, f"encoder.initial_block.{bn_ini}", enc_p["initial"]["bn"], enc_s["initial"]["bn"], tasks)
    for i, spec in enumerate(ENCODER_PLAN):
        pre = f"encoder.layers.{i}"
        p, s = _enc_block(enc_p, enc_s, i)
        if spec[0] == "down":
            _export_conv(out, f"{pre}.conv", p["conv"], False)
            _export_bn(out, f"{pre}.{bn_ini}", p["bn"], s["bn"], tasks)
        else:
            _export_nb(out, pre, p, s, rap, tasks)

    if kind == "erfnet":
        dec_list = [("decoder", params["decoder"], state["decoder"])]
    else:
        heads = _HEAD_PREFIXES[kind](len(params["decoders"]))
        dec_list = [(h, p, s) for h, p, s in zip(heads, params["decoders"], state["decoders"])]
    for hp, dp, ds in dec_list:
        for j, spec in enumerate(DECODER_PLAN):
            pre = f"{hp}.layers.{j}"
            p, s = _dec_block(dp, ds, j)
            if spec[0] == "up":
                _export_conv(out, f"{pre}.conv", p["conv"], True)
                _export_bn(out, f"{pre}.bn", p["bn"], s["bn"], None)
            else:
                _export_nb(out, pre, p, s, False, None)
        _export_conv(out, f"{hp}.output_conv", dp["output_conv"], True)
    if prefix:
        out = {prefix + k: v for k, v in out.items()}
    return out


def load_pth_tar(path: str) -> dict[str, np.ndarray]:
    """Read a reference checkpoint file; returns numpy-valued state dict.

    Reference checkpoints are dicts {epoch, arch, state_dict, best_acc,
    optimizer} with module.-prefixed keys (train_RAPFT_step1.py:364-370).
    """
    import torch  # optional dependency, only needed to read torch pickles

    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}
