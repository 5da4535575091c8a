"""LoRA as a pure parameter pytree + functional combinators.

The reference mutates torch nn.Module trees in place
(inject/monkeypatch/collapse: lora.py:255-886).  Here a LoRA is data:

    lora = {
        "sites": {site_name: {"up": (out, r), "down": (r, in)}   # linear
                              or {"up": (out, r, 1, 1),
                                  "down": (r, in, kh, kw)}},     # conv
        "scale": f32 scalar,          # tune_lora_scale knob (traced: no
                                      # recompile on alpha sweeps)
    }

plus optional per-site "diag" (r,) — the reference's selector
(set_lora_diag / LoRAManager.tune, lora.py:63-70,883-886).

A site entry may instead hold a full-rank weight delta
{"delta": (out, in[, kh, kw])} — the exact form of LyCORIS LoHa/LoKr/IA3
modules, whose Hadamard/Kronecker compositions are not low-rank and so
cannot be represented as an (up, down) pair (formats/lycoris.py). Delta
entries participate in forward application, scale tuning, merge/add,
collapse and inspection; they cannot be re-factored into pairs
(lora_to_pairs raises — use core/svd.py to distill a rank-r approximation).

"Injection" is just passing this tree to a model's forward; "removal" is
passing None; merge/join/collapse are the pure functions below.  Weight
layout matches torch Linear/Conv2d (out,in[,kh,kw]) so serialization is
byte-identical to the reference format.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .sites import Site

Pair = Tuple[np.ndarray, np.ndarray]
LoraTree = Dict[str, object]


# ---------------------------------------------------------------------------
# construction
# ---------------------------------------------------------------------------

def init_lora(
    sites: Sequence[Site],
    r: int = 4,
    *,
    rng: jax.Array,
    scale: float = 1.0,
    dtype=jnp.float32,
) -> LoraTree:
    """Fresh trainable LoRA: down ~ N(0, 1/r), up = 0 (reference init,
    lora.py:50-51,127-128) so the forward pass is initially unchanged."""
    site_params = {}
    keys = jax.random.split(rng, max(len(sites), 1))
    for site, key in zip(sites, keys):
        if r > min(site.in_dim, site.out_dim):
            raise ValueError(
                f"LoRA rank {r} must be less or equal than "
                f"{min(site.in_dim, site.out_dim)} at {site.name}"
            )
        if site.kind == "linear":
            down = jax.random.normal(key, (r, site.in_dim), dtype) * (1.0 / r)
            up = jnp.zeros((site.out_dim, r), dtype)
        else:
            kh, kw = site.kernel
            down = jax.random.normal(key, (r, site.in_dim, kh, kw), dtype) * (1.0 / r)
            up = jnp.zeros((site.out_dim, r, 1, 1), dtype)
        site_params[site.name] = {"up": up, "down": down}
    return {"sites": site_params, "scale": jnp.asarray(scale, jnp.float32)}


def lora_from_pairs(
    pairs: Sequence[Pair],
    sites: Sequence[Site],
    scale: float = 1.0,
    dtype=jnp.float32,
) -> LoraTree:
    """Build a LoRA tree from an ordered [(up, down), ...] list (the on-disk
    order). Conv tensors are detected by ndim, mirroring the reference's
    shape dispatch (lora.py:731,756)."""
    if len(pairs) != len(sites):
        raise ValueError(f"got {len(pairs)} pairs for {len(sites)} sites")
    site_params = {}
    for site, (up, down) in zip(sites, pairs):
        up = jnp.asarray(np.asarray(up), dtype)
        down = jnp.asarray(np.asarray(down), dtype)
        want_nd = 2 if site.kind == "linear" else 4
        if up.ndim != want_nd or down.ndim != want_nd:
            raise ValueError(
                f"site {site.name} expects {want_nd}-D tensors, got "
                f"up{up.shape} down{down.shape}"
            )
        site_params[site.name] = {"up": up, "down": down}
    return {"sites": site_params, "scale": jnp.asarray(scale, jnp.float32)}


def lora_from_flat(
    weights: Sequence[np.ndarray], sites: Sequence[Site], scale: float = 1.0,
    dtype=jnp.float32,
) -> LoraTree:
    from ..formats.safetensors_io import pairs_from_flat

    return lora_from_pairs(pairs_from_flat(list(weights)), sites, scale, dtype)


def lora_from_deltas(
    deltas: Sequence[np.ndarray],
    sites: Sequence[Site],
    scale: float = 1.0,
    dtype=jnp.float32,
) -> LoraTree:
    """Build a LoRA tree of full-rank weight deltas (torch weight layout:
    (out, in) linear / OIHW conv). The exact representation of composed
    LyCORIS LoHa/LoKr/IA3 modules — see module docstring."""
    if len(deltas) != len(sites):
        raise ValueError(f"got {len(deltas)} deltas for {len(sites)} sites")
    site_params = {}
    for site, d in zip(sites, deltas):
        d = jnp.asarray(np.asarray(d), dtype)
        want = ((site.out_dim, site.in_dim) if site.kind == "linear"
                else (site.out_dim, site.in_dim) + site.kernel)
        if tuple(d.shape) != want:
            raise ValueError(
                f"site {site.name} expects delta shape {want}, got {d.shape}")
        site_params[site.name] = {"delta": d}
    return {"sites": site_params, "scale": jnp.asarray(scale, jnp.float32)}


def lora_to_pairs(lora: LoraTree, sites: Sequence[Site]) -> List[Pair]:
    """Realize as save-order pairs; up is pre-multiplied by the runtime scale
    (reference realize_as_lora, lora.py:60-61 — the selector diag is NOT
    folded in, matching the reference)."""
    scale = np.asarray(lora["scale"], np.float32)
    out: List[Pair] = []
    for site in sites:
        entry = lora["sites"][site.name]
        if "delta" in entry:
            raise ValueError(
                f"site {site.name} holds a full-rank delta (LoHa/LoKr/IA3); "
                f"it has no (up, down) factorization — distill one with "
                f"core.svd first")
        out.append(
            (np.asarray(entry["up"], np.float32) * scale,
             np.asarray(entry["down"], np.float32))
        )
    return out


# ---------------------------------------------------------------------------
# combinators
# ---------------------------------------------------------------------------

def tune_lora_scale(lora: LoraTree, alpha: float) -> LoraTree:
    """Reference tune_lora_scale (lora.py:877-880), functionally."""
    return {**lora, "scale": jnp.asarray(alpha, jnp.float32)}


def set_lora_diag(lora: LoraTree, diag) -> LoraTree:
    """Install a per-rank diagonal selector on every site
    (reference set_lora_diag, lora.py:883-886)."""
    diag = jnp.asarray(diag, jnp.float32)
    sites = {
        name: {**entry, "diag": diag} for name, entry in lora["sites"].items()
    }
    return {**lora, "sites": sites}


def merge_loras(l1: LoraTree, l2: LoraTree, alpha_1: float, alpha_2: float) -> LoraTree:
    """Per-tensor weighted sum — `lora_add --mode=lpl`
    (cli_lora_add.py:39-107)."""
    if set(l1["sites"]) != set(l2["sites"]):
        raise ValueError("merge requires identical site sets")
    sites = {}
    for name in l1["sites"]:
        a, b = l1["sites"][name], l2["sites"][name]
        if ("delta" in a) != ("delta" in b):
            raise ValueError(
                f"cannot merge a factored LoRA with a full-rank delta at "
                f"{name}")
        if "delta" in a:
            if a["delta"].shape != b["delta"].shape:
                raise ValueError(f"shape mismatch at {name}")
            sites[name] = {
                "delta": alpha_1 * a["delta"] + alpha_2 * b["delta"]}
            continue
        if a["up"].shape != b["up"].shape or a["down"].shape != b["down"].shape:
            raise ValueError(f"shape mismatch at {name}")
        sites[name] = {
            "up": alpha_1 * a["up"] + alpha_2 * b["up"],
            "down": alpha_1 * a["down"] + alpha_2 * b["down"],
        }
    return {"sites": sites, "scale": jnp.asarray(1.0, jnp.float32)}


def add_lora(lora: LoraTree, incoming: LoraTree, alpha: float = 1.0,
             beta: float = 1.0) -> LoraTree:
    """up/down <- alpha*incoming + beta*existing — the dynamic-mixing
    primitive (reference monkeypatch_add_lora, lora.py:850-874)."""
    sites = {}
    for name, entry in lora["sites"].items():
        inc = incoming["sites"][name]
        if "delta" in entry or "delta" in inc:
            if not ("delta" in entry and "delta" in inc):
                raise ValueError(
                    f"cannot mix a factored LoRA with a full-rank delta at "
                    f"{name}")
            sites[name] = {
                "delta": alpha * inc["delta"] + beta * entry["delta"]}
            continue
        sites[name] = {
            "up": alpha * inc["up"] + beta * entry["up"],
            "down": alpha * inc["down"] + beta * entry["down"],
        }
    return {**lora, "sites": sites}


def join_loras(loras: Sequence[LoraTree]) -> Tuple[LoraTree, List[int]]:
    """Concatenate N LoRAs into one of rank sum(r_i): down stacked on the
    rank axis 0, up on axis 1 (reference lora_join, lora_manager.py:44-55).
    Returns (joined, ranklist) for block-diagonal selector tuning."""
    names = set(loras[0]["sites"])
    for l in loras[1:]:
        if set(l["sites"]) != names:
            raise ValueError("join requires identical site sets")
    ranklist = []
    for l in loras:
        if any("delta" in e for e in l["sites"].values()):
            raise ValueError(
                "join requires factored (up, down) LoRAs; full-rank "
                "LoHa/LoKr/IA3 deltas have no rank axis to concatenate")
        ranks = {e["down"].shape[0] for e in l["sites"].values()}
        if len(ranks) > 1:
            raise ValueError("Rank should be the same per model")
        ranklist.append(ranks.pop() if ranks else 0)
    sites = {}
    for name in loras[0]["sites"]:
        ups = [l["sites"][name]["up"] for l in loras]
        downs = [l["sites"][name]["down"] for l in loras]
        sites[name] = {
            "up": jnp.concatenate(ups, axis=1),
            "down": jnp.concatenate(downs, axis=0),
        }
    return {"sites": sites, "scale": jnp.asarray(1.0, jnp.float32)}, ranklist


def collapse_lora(params: Dict[str, jax.Array], lora: LoraTree,
                  alpha: float = 1.0) -> Dict[str, jax.Array]:
    """Fold the LoRA into the base weights: W += alpha * up @ down (conv
    kernels flattened to 2-D, matching lora.py:635-669; the runtime scale
    and selector are intentionally NOT applied, as in the reference).
    Returns a new params dict."""
    out = dict(params)
    for name, entry in lora["sites"].items():
        key = name + ".weight"
        w = out[key]
        if "delta" in entry:
            delta = jnp.asarray(entry["delta"], jnp.float32)
        else:
            up = jnp.asarray(entry["up"], jnp.float32)
            down = jnp.asarray(entry["down"], jnp.float32)
            delta = (up.reshape(up.shape[0], -1)
                     @ down.reshape(down.shape[0], -1))
        out[key] = (w.astype(jnp.float32) + alpha * delta.reshape(w.shape)).astype(
            w.dtype
        )
    return out


def lora_ranks(lora: LoraTree, sites: Sequence[Site]) -> List[int]:
    out = []
    for s in sites:
        entry = lora["sites"][s.name]
        if "delta" in entry:
            raise ValueError(
                f"site {s.name} holds a full-rank delta; it has no rank")
        out.append(int(entry["down"].shape[0]))
    return out


def inspect_lora(lora: LoraTree) -> Dict[str, List[float]]:
    """Per-site mean |up @ down| drift diagnostic (lora.py:1025-1042)."""
    moved: Dict[str, List[float]] = {}
    for name, entry in lora["sites"].items():
        if "delta" in entry:
            moved[name] = [float(np.abs(np.asarray(entry["delta"],
                                                   np.float32)).mean())]
            continue
        up = np.asarray(entry["up"], np.float32).reshape(entry["up"].shape[0], -1)
        down = np.asarray(entry["down"], np.float32).reshape(
            entry["down"].shape[0], -1
        )
        moved[name] = [float(np.abs(up @ down).mean())]
    return moved


def stack_loras(loras: Sequence[LoraTree]) -> LoraTree:
    """Stack K same-shape LoRAs into one batched tree for per-sample routed
    serving: up (K, out, r[, 1, 1]), down (K, r, in[, kh, kw]), scale (K,).
    At apply time the tree carries "idx" (B,) selecting a LoRA per batch
    element — K adapters served in ONE jitted program (linear sites: one
    gather + two einsums; conv sites: one grouped conv + an einsum; no
    per-request recompilation)."""
    names = set(loras[0]["sites"])
    for l in loras[1:]:
        if set(l["sites"]) != names:
            raise ValueError("stack requires identical site sets")
    sites = {}
    for name in names:
        entries = [l["sites"][name] for l in loras]
        if any("delta" in e for e in entries):
            raise ValueError(
                f"stack requires factored (up, down) LoRAs at {name}; "
                f"full-rank LoHa/LoKr/IA3 deltas are not routable")
        shapes = {(tuple(e["up"].shape), tuple(e["down"].shape))
                  for e in entries}
        if len(shapes) > 1:
            raise ValueError(f"rank mismatch at {name}: {shapes}")
        sites[name] = {"up": jnp.stack([e["up"] for e in entries]),
                       "down": jnp.stack([e["down"] for e in entries])}
    scale = jnp.stack([jnp.asarray(l["scale"], jnp.float32) for l in loras])
    return {"sites": sites, "scale": scale}


def with_lora_idx(lora: LoraTree, idx) -> LoraTree:
    """Attach the per-sample adapter index to a stacked LoRA tree."""
    return {**lora, "idx": jnp.asarray(idx, jnp.int32)}


# ---------------------------------------------------------------------------
# forward-pass application
# ---------------------------------------------------------------------------

def _maybe_diag(h: jax.Array, entry: dict) -> jax.Array:
    diag = entry.get("diag")
    if diag is None:
        return h
    return h * diag.astype(h.dtype)


def lora_delta_dense(x: jax.Array, entry: dict, scale: jax.Array,
                     dropout_rng: Optional[jax.Array] = None,
                     dropout_p: float = 0.0,
                     idx: Optional[jax.Array] = None) -> jax.Array:
    """scale * up(selector(down(x))) for a linear site. x: (..., in).

    Batched serving: when entry holds stacked adapters (up (K,out,r)) and
    `idx` (B,) is given, each batch element routes through its own adapter
    (x must be batch-leading).

    Full-rank delta entries (LoHa/LoKr/IA3, formats/lycoris.py) apply as
    one matmul: scale * x @ delta.T."""
    dt = x.dtype
    if "delta" in entry:
        d = x @ entry["delta"].astype(dt).T
        if dropout_rng is not None and dropout_p > 0.0:
            keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_p, d.shape)
            d = jnp.where(keep, d / (1.0 - dropout_p), 0.0).astype(dt)
        return d * scale.astype(dt)
    down = entry["down"]
    up = entry["up"]
    if up.ndim == 3:
        if idx is None:
            raise ValueError("stacked LoRA needs with_lora_idx(...)")
        dsel = down[idx].astype(dt)   # (B, r, in)
        usel = up[idx].astype(dt)     # (B, out, r)
        h = jnp.einsum("b...i,bri->b...r", x, dsel)
        d = jnp.einsum("b...r,bor->b...o", h, usel)
        s = scale[idx].astype(dt)
        return d * s.reshape((-1,) + (1,) * (d.ndim - 1))
    down = down.astype(dt)
    up = up.astype(dt)
    h = x @ down.T
    h = _maybe_diag(h, entry)
    d = h @ up.T
    if dropout_rng is not None and dropout_p > 0.0:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_p, d.shape)
        d = jnp.where(keep, d / (1.0 - dropout_p), 0.0).astype(dt)
    return d * scale.astype(dt)


def lora_delta_conv(x: jax.Array, entry: dict, scale: jax.Array,
                    stride: Tuple[int, int], padding: Tuple[int, int],
                    dropout_rng: Optional[jax.Array] = None,
                    dropout_p: float = 0.0,
                    idx: Optional[jax.Array] = None) -> jax.Array:
    """Conv LoRA bypass: down conv (original geometry) then 1x1 up conv
    (lora.py:105-135). x: NHWC; kernels stored OIHW.

    Batched serving: when entry holds stacked adapters (down
    (K, r, in, kh, kw)) and `idx` (B,) is given, each batch element routes
    through its own adapter's kernels — the per-sample down convs run as ONE
    grouped convolution (batch folded into feature groups), then a per-
    sample 1x1 up einsum.

    Full-rank delta entries (LoHa/LoKr/IA3) apply as one conv with the
    delta kernel in the site's original geometry."""
    dt = x.dtype
    if "delta" in entry:
        d = jax.lax.conv_general_dilated(
            x, entry["delta"].astype(dt), window_strides=stride,
            padding=[(padding[0], padding[0]), (padding[1], padding[1])],
            dimension_numbers=("NHWC", "OIHW", "NHWC"),
        )
        if dropout_rng is not None and dropout_p > 0.0:
            keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_p, d.shape)
            d = jnp.where(keep, d / (1.0 - dropout_p), 0.0).astype(dt)
        return d * scale.astype(dt)
    down = entry["down"]
    up = entry["up"]
    if up.ndim == 5:
        if idx is None:
            raise ValueError("stacked conv LoRA needs with_lora_idx(...)")
        B, H, W, C = x.shape
        dsel = down[idx].astype(dt)          # (B, r, C, kh, kw)
        usel = up[idx].astype(dt)            # (B, out, r, 1, 1)
        r = dsel.shape[1]
        # fold batch into feature groups: input (1, H, W, B*C), kernel
        # (B*r, C, kh, kw), groups=B -> output (1, H', W', B*r)
        xg = x.transpose(1, 2, 0, 3).reshape(1, H, W, B * C)
        kg = dsel.reshape(B * r, C, *dsel.shape[3:])
        dn = jax.lax.conv_general_dilated(
            xg, kg, window_strides=stride,
            padding=[(padding[0], padding[0]), (padding[1], padding[1])],
            dimension_numbers=("NHWC", "OIHW", "NHWC"),
            feature_group_count=B,
        )
        Hp, Wp = dn.shape[1], dn.shape[2]
        dn = dn.reshape(Hp, Wp, B, r).transpose(2, 0, 1, 3)  # (B, H', W', r)
        dn = _maybe_diag(dn, entry)
        d = jnp.einsum("bhwr,bor->bhwo", dn, usel[..., 0, 0])
        s = scale[idx].astype(dt)
        return d * s[:, None, None, None]
    down = down.astype(dt)
    up = up.astype(dt)
    dn = jax.lax.conv_general_dilated(
        x, down, window_strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        dimension_numbers=("NHWC", "OIHW", "NHWC"),
    )
    dn = _maybe_diag(dn, entry)
    d = jax.lax.conv_general_dilated(
        dn, up, window_strides=(1, 1), padding=[(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "OIHW", "NHWC"),
    )
    if dropout_rng is not None and dropout_p > 0.0:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_p, d.shape)
        d = jnp.where(keep, d / (1.0 - dropout_p), 0.0).astype(dt)
    return d * scale.astype(dt)
