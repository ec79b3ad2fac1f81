"""Convert a reference torch checkpoint (unidet3d.pth) into this framework's
parameter tree.

Covers every parameter of the reference model (unidet3d/unidet3d.py:95-111,
spconv_unet.py, encoder.py:131-163):
  input_conv / output_layer, the recursive SpConvUNet (blocks / conv / u /
  deconv / blocks_tail), and the decoder (input_proj, self-attn, FFN, norms,
  unified cls head, box head).

Layout notes:
  * spconv conv weights are stored (Cout, k0, k1, k2, Cin) (KRSC) or
    (k0, k1, k2, Cin, Cout); both are detected by shape. Kernel offsets map
    to our flat (K, Cin, Cout) layout with x-major offset order.
  * torch Linear weight (out, in) -> flax Dense kernel (in, out).
  * nn.MultiheadAttention in_proj (3d, d) splits into q/k/v and reshapes to
    flax (d, heads, head_dim); out_proj reshapes to (heads, head_dim, d).
  * BN: weight/bias -> scale/bias; running stats -> batch_stats.

Robustness (real checkpoints diverge from synthetic twins in key names
alone): `module.`/`model.` wrapper prefixes are stripped, `num_batches_
tracked` buffers are ignored, any key the conversion never consumed is
reported explicitly (not silently dropped), and a missing key raises a
KeyError that lists the nearest names present in the file instead of a
bare miss.

Usage:
  python -m unidet3d_tpu.tools.convert_checkpoint unidet3d.pth out_dir \
      [--planes 32 64 96 128 160] [--d-model 256] [--heads 8]
"""
from __future__ import annotations

import argparse
import difflib
from typing import Dict

import numpy as np

# Buffer suffixes that exist in torch BN state but have no JAX counterpart.
_IGNORED_SUFFIXES = (".num_batches_tracked",)
# DDP / EMA wrapper prefixes seen in real .pth files.
_WRAPPER_PREFIXES = ("module.", "model.")


def normalize_state_dict(sd: dict) -> dict:
    """Strip a uniform DDP/EMA wrapper prefix (`module.` / `model.`) when
    EVERY key carries it — real checkpoints saved through
    MMDistributedDataParallel do (reference trains via mmengine wrappers,
    tools/train.py:48-52)."""
    keys = list(sd.keys())
    for pre in _WRAPPER_PREFIXES:
        if keys and all(k.startswith(pre) for k in keys):
            return {k[len(pre):]: v for k, v in sd.items()}
    return sd


class _TrackedDict(dict):
    """Records which keys the conversion consumed, and turns a miss into a
    report naming the closest keys actually present."""

    def __init__(self, sd: dict):
        super().__init__(sd)
        self.consumed: set = set()

    def __getitem__(self, k):
        try:
            v = super().__getitem__(k)
        except KeyError:
            close = difflib.get_close_matches(k, self.keys(), n=3, cutoff=0.4)
            raise KeyError(
                f"checkpoint is missing expected key {k!r}"
                + (f"; closest present keys: {close}" if close else
                   "; no similar keys present — wrong architecture flags "
                   "(--planes/--layers) or not a unidet3d checkpoint?")
            ) from None
        self.consumed.add(k)
        return v

    def unexpected(self) -> list:
        return sorted(
            k for k in self.keys()
            if k not in self.consumed
            and not k.endswith(_IGNORED_SUFFIXES)
        )


def _t(w):  # torch Linear -> flax Dense
    return np.ascontiguousarray(np.asarray(w).T)


def _conv_kernel(w: np.ndarray, k: int) -> np.ndarray:
    """spconv weight -> (k^3, Cin, Cout), x-major offset order."""
    w = np.asarray(w)
    if w.ndim != 5:
        raise ValueError(f"unexpected conv weight shape {w.shape}")
    if w.shape[1] == k and w.shape[2] == k and w.shape[3] == k:
        # (Cout, k, k, k, Cin) KRSC
        w = np.transpose(w, (1, 2, 3, 4, 0))  # (k,k,k,Cin,Cout)
    elif w.shape[0] == k and w.shape[1] == k and w.shape[2] == k:
        pass  # already (k,k,k,Cin,Cout)
    else:
        raise ValueError(f"unexpected conv weight shape {w.shape}")
    return np.ascontiguousarray(w.reshape(k**3, w.shape[3], w.shape[4]))


def _bn(sd, prefix):
    return (
        {
            "scale": np.asarray(sd[f"{prefix}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bias"]),
        },
        {
            "mean": np.asarray(sd[f"{prefix}.running_mean"]),
            "var": np.asarray(sd[f"{prefix}.running_var"]),
        },
    )


def _residual_block(sd, prefix):
    params: Dict = {}
    stats: Dict = {}
    n1p, n1s = _bn(sd, f"{prefix}.conv_branch.0")
    params["norm1"], stats["norm1"] = n1p, n1s
    params["conv1"] = {"kernel": _conv_kernel(sd[f"{prefix}.conv_branch.2.weight"], 3)}
    n2p, n2s = _bn(sd, f"{prefix}.conv_branch.3")
    params["norm2"], stats["norm2"] = n2p, n2s
    params["conv2"] = {"kernel": _conv_kernel(sd[f"{prefix}.conv_branch.5.weight"], 3)}
    ib = f"{prefix}.i_branch.0.weight"
    if ib in sd:
        w = np.asarray(sd[ib])
        if w.ndim == 5:  # 1x1x1 subm conv -> plain (Cin, Cout) matmul
            w = _conv_kernel(w, 1)[0]
        params["i_branch"] = np.ascontiguousarray(w)
    return params, stats


def convert_torch_state_dict(
    sd: dict,
    num_levels: int = 5,
    num_layers: int = 6,
    d_model: int = 256,
    num_heads: int = 8,
    report: dict | None = None,
):
    """state_dict (torch tensors or numpy) -> {'params', 'batch_stats'}.

    Tolerant of real-checkpoint key variants: a uniform `module.`/`model.`
    prefix is stripped, BN `num_batches_tracked` buffers are skipped, and
    keys the conversion does not consume are surfaced in `report`
    (pass a dict; filled with {'unexpected': [...], 'consumed': int}) —
    never a silent drop, never a KeyError on extras."""
    sd = _TrackedDict(
        {k: np.asarray(v) for k, v in normalize_state_dict(sd).items()}
    )
    params: Dict = {"backbone": {}, "decoder": {}}
    stats: Dict = {"backbone": {}}
    bb = params["backbone"]
    bs = stats["backbone"]

    bb["input_conv"] = {"kernel": _conv_kernel(sd["input_conv.0.weight"], 3)}
    onp, ons = _bn(sd, "output_layer.0")
    bb["output_norm"] = onp
    bs["output_norm"] = ons

    unet_p: Dict = {}
    unet_s: Dict = {}
    for lvl in range(num_levels):
        u = "unet." + "u." * lvl
        for i in range(2):
            p, s = _residual_block(sd, f"{u}blocks.block{i}")
            unet_p[f"level{lvl}_block{i}"] = p
            unet_s[f"level{lvl}_block{i}"] = s
        if lvl < num_levels - 1:
            dp, dstat = _bn(sd, f"{u}conv.0")
            unet_p[f"level{lvl}_down_norm"] = dp
            unet_s[f"level{lvl}_down_norm"] = dstat
            unet_p[f"level{lvl}_down_kernel"] = _conv_kernel(
                sd[f"{u}conv.2.weight"], 2
            )
            up, ustat = _bn(sd, f"{u}deconv.0")
            unet_p[f"level{lvl}_up_norm"] = up
            unet_s[f"level{lvl}_up_norm"] = ustat
            unet_p[f"level{lvl}_up_kernel"] = _conv_kernel(
                sd[f"{u}deconv.2.weight"], 2
            )
            for i in range(2):
                p, s = _residual_block(sd, f"{u}blocks_tail.block{i}")
                unet_p[f"level{lvl}_tail{i}"] = p
                unet_s[f"level{lvl}_tail{i}"] = s
    bb["unet"] = unet_p
    bs["unet"] = unet_s

    dec = params["decoder"]
    dec["proj_fc1"] = {
        "kernel": _t(sd["decoder.input_proj.0.weight"]),
        "bias": np.asarray(sd["decoder.input_proj.0.bias"]),
    }
    dec["proj_fc2"] = {
        "kernel": _t(sd["decoder.input_proj.2.weight"]),
        "bias": np.asarray(sd["decoder.input_proj.2.bias"]),
    }
    hd = d_model // num_heads
    for i in range(num_layers):
        ap = f"decoder.self_attn_layers.{i}"
        inw = np.asarray(sd[f"{ap}.attn.in_proj_weight"])  # (3d, d)
        inb = np.asarray(sd[f"{ap}.attn.in_proj_bias"])
        q, k, v = np.split(inw, 3, axis=0)
        qb, kb, vb = np.split(inb, 3, axis=0)

        def qkv(w, b):
            return {
                "kernel": _t(w).reshape(d_model, num_heads, hd),
                "bias": b.reshape(num_heads, hd),
            }

        outw = np.asarray(sd[f"{ap}.attn.out_proj.weight"])  # (d, d)
        dec[f"attn{i}"] = {
            "attn": {
                "query": qkv(q, qb),
                "key": qkv(k, kb),
                "value": qkv(v, vb),
                "out": {
                    "kernel": _t(outw).reshape(num_heads, hd, d_model),
                    "bias": np.asarray(sd[f"{ap}.attn.out_proj.bias"]),
                },
            },
            "norm": {
                "scale": np.asarray(sd[f"{ap}.norm.weight"]),
                "bias": np.asarray(sd[f"{ap}.norm.bias"]),
            },
        }
        fp = f"decoder.ffn_layers.{i}"
        dec[f"ffn{i}"] = {
            "fc1": {
                "kernel": _t(sd[f"{fp}.net.0.weight"]),
                "bias": np.asarray(sd[f"{fp}.net.0.bias"]),
            },
            "fc2": {
                "kernel": _t(sd[f"{fp}.net.3.weight"]),
                "bias": np.asarray(sd[f"{fp}.net.3.bias"]),
            },
            "norm": {
                "scale": np.asarray(sd[f"{fp}.norm.weight"]),
                "bias": np.asarray(sd[f"{fp}.norm.bias"]),
            },
        }
    dec["out_norm"] = {
        "scale": np.asarray(sd["decoder.out_norm.weight"]),
        "bias": np.asarray(sd["decoder.out_norm.bias"]),
    }
    dec["cls_fc1"] = {
        "kernel": _t(sd["decoder.outs_cls.0.weight"]),
        "bias": np.asarray(sd["decoder.outs_cls.0.bias"]),
    }
    dec["cls_fc2"] = {
        "kernel": _t(sd["decoder.outs_cls.2.weight"]),
        "bias": np.asarray(sd["decoder.outs_cls.2.bias"]),
    }
    dec["box_fc"] = {
        "kernel": _t(sd["decoder.out_bboxes.linear.weight"]),
        "bias": np.asarray(sd["decoder.out_bboxes.linear.bias"]),
    }
    if report is not None:
        report["unexpected"] = sd.unexpected()
        report["consumed"] = len(sd.consumed)
    return {"params": params, "batch_stats": stats}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint", help="torch .pth file")
    ap.add_argument("out", help="output orbax params dir")
    ap.add_argument("--planes", type=int, nargs="+", default=[32, 64, 96, 128, 160])
    ap.add_argument("--d-model", type=int, default=256)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--layers", type=int, default=6)
    args = ap.parse_args()

    import torch

    ckpt = torch.load(args.checkpoint, map_location="cpu")
    sd = ckpt.get("state_dict", ckpt)
    report: dict = {}
    tree = convert_torch_state_dict(
        sd,
        num_levels=len(args.planes),
        num_layers=args.layers,
        d_model=args.d_model,
        num_heads=args.heads,
        report=report,
    )
    from ..train.checkpoint import save_params

    save_params(args.out, tree)
    print(f"converted {report.get('consumed', len(sd))} tensors -> {args.out}")
    if report.get("unexpected"):
        print(f"WARNING: {len(report['unexpected'])} checkpoint keys were "
              "not consumed by the conversion (unknown to this "
              "architecture):")
        for k in report["unexpected"]:
            print(f"  - {k}")


if __name__ == "__main__":
    main()
