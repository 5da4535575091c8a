"""LyCORIS (LoHa / LoKr / IA3 / DoRA / diag-OFT / BOFT) interop — the
kohya-family algorithms beyond plain LoRA/LoCon.

These share the kohya key schema (`lora_unet_<path>.<factor>` /
`lora_te_<path>.<factor>`, see formats/kohya.py) but factor the weight
delta differently:

- **LoHa** (Hadamard product): dW = (w1a @ w1b) * (w2a @ w2b) * alpha/r.
  Factor keys `hada_w1_a (out, r)`, `hada_w1_b (r, in*kh*kw)` (and the
  w2 pair). Tucker-decomposed convs carry `hada_t1/t2 (r, r, kh, kw)`
  with `hada_w*_a (r, out)` / `hada_w*_b (r, in)`; each side rebuilds as
  einsum('ijkl,ip,jr->prkl', t, wa, wb).
- **LoKr** (Kronecker product): dW = kron(w1, w2) * alpha/r where w1
  (out1, in1) may itself be factored `lokr_w1_a @ lokr_w1_b` and w2
  (out2, in2[*kh*kw]) may be factored or Tucker (`lokr_t2`); out =
  out1*out2, in = in1*in2. alpha applies only when a factored side
  provides a rank r; otherwise the multiplier is 1.
- **IA3**: a learned per-channel gain on the frozen weight,
  dW = W * v with v broadcast over the input axis (`on_input` true) or
  the output axis. The delta depends on the BASE weight, so loading
  requires the model's params.
- **DoRA** (weight-decomposed LoRA): plain LoRA factors plus a learned
  per-output-channel magnitude `dora_scale` m; the merged weight is
  W' = m * (W + dW_lora) / ||W + dW_lora||_row (row = per output channel
  over all remaining axes, + fp32 eps — the LyCORIS `wd` /PEFT DoRA
  algebra). Base-weight-dependent, so loading requires params. Our tree
  scale lerps `W + s*(W' - W)`, which is EXACTLY LyCORIS's multiplier
  semantics (it lerps merged vs original weights linearly).
- **BOFT** (butterfly OFT): m stages of butterfly-permuted block
  rotations — `oft_blocks (m, num_blocks, b, b)`; each stage interleaves
  channel wings (c, 2, 2^i*b/2) -> (c, 2^i*b/2, 2), Cayley-rotates blocks
  of b, and un-interleaves (the LyCORIS modules/boft.py make_weight
  construction). Base-weight-dependent.
- **diag-OFT**: a block-diagonal orthogonal transform of the output
  channels. `oft_blocks` (k, b, b) parametrizes per-block skew
  Q = q - q^T, Cayley R = (I+Q)(I-Q)^-1, and W'[k,m,:] =
  sum_n R[k,n,m] W[k,n,:] over out reshaped to (k, b) — the kohya
  sd-scripts networks/oft.py construction, with its norm constraint
  ||Q||_F <= alpha * out_dim when `alpha` > 0 and the LyCORIS
  "rescaled" variant's per-channel `rescale` applied after the
  rotation. Base-weight-dependent.

- **GLoRA**: the GLoRA paper's W' = W + W.A + B — A = a2 @ a1 acts on
  the frozen weight's input, B = b2 @ b1 is a plain low-rank bypass,
  both scaled alpha/r (LyCORIS modules/glora.py; factor keys
  `a1/a2/b1/b2.weight`). Base-weight-dependent.
- **full**: the stored `diff` IS the weight delta (W_tuned - W_base,
  LyCORIS modules/full.py); an optional `diff_b` bias delta rides the
  tree's `param_deltas` channel (biases are not matmul sites).
- **norm**: `w_norm`/`b_norm` deltas on GroupNorm/LayerNorm layers
  (LyCORIS modules/norms.py, train_norm=True). Norm layers are outside
  the matmul site registry, so these resolve against the model's own
  param paths and load as `param_deltas` which the pipes apply to base
  params as W + scale * delta — exact, since norm outputs are linear in
  (weight, bias).

The Hadamard/Kronecker/DoRA/OFT/GLoRA/full compositions are full-rank,
so they load as exact `{"delta"}` entries in the LoRA pytree
(core/lora.lora_from_deltas) rather than (up, down) pairs; forward
application, scale tuning, collapse and removal all work identically. A
single file may mix algorithms per module (plain LoRA pairs included —
those stay factored). Unknown factor keys (LoHa++ variants, mixed
factor sets, ...) raise loudly so a partial load can never pass
silently.

The reference repo predates LyCORIS entirely (its formats are the
`{model}:{idx}:up/down` safetensors and flat `.pt` lists —
/root/reference/lora_diffusion/lora.py:451-535); this module exists for
the same reason formats/kohya.py does: users migrating here bring
webui-ecosystem files.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from ..core.lora import LoraTree
from ..core.sites import Site
from .kohya import _compose_cp_mid, _site_index, _PREFIX
from .reader import SafetensorsFile

# factor-key sets per algorithm (leaf names after the module base)
_LORA_LEAVES = {"lora_up", "lora_down", "lora_mid", "alpha"}
_LOHA_LEAVES = {"hada_w1_a", "hada_w1_b", "hada_w2_a", "hada_w2_b",
                "hada_t1", "hada_t2", "alpha"}
_LOKR_LEAVES = {"lokr_w1", "lokr_w1_a", "lokr_w1_b",
                "lokr_w2", "lokr_w2_a", "lokr_w2_b", "lokr_t2", "alpha"}
# trainers write .alpha for IA3 modules too; apply-time loaders ignore it
# (the gain is absolute), so we accept-and-ignore rather than reject
_IA3_LEAVES = {"weight", "on_input", "alpha"}
_DORA_LEAVES = _LORA_LEAVES | {"dora_scale"}
_OFT_LEAVES = {"oft_blocks", "alpha", "rescale"}
_GLORA_LEAVES = {"a1", "a2", "b1", "b2", "alpha"}
_FULL_LEAVES = {"diff", "diff_b", "alpha"}
_NORM_LEAVES = {"w_norm", "b_norm", "alpha"}

def is_lycoris(keys: Sequence[str]) -> bool:
    """True if any key carries a LoHa/LoKr/IA3/DoRA/OFT/GLoRA/full/norm
    factor (vs plain kohya LoRA/LoCon, which formats/kohya.py loads
    keeping the factorization)."""
    for k in keys:
        leaf = k.rpartition(".")[2]
        if leaf.startswith(("hada_", "lokr_")) or \
                leaf in ("on_input", "dora_scale", "oft_blocks",
                         "diff", "diff_b", "w_norm", "b_norm"):
            return True
        if k.endswith((".a1.weight", ".a2.weight",
                       ".b1.weight", ".b2.weight")):
            return True
    return False


def _detect_algo(base: str, leaves: set) -> str:
    # magnitude/rotation/diff tensors are unambiguous markers; check them
    # first (a DoRA group is a superset of the plain-LoRA leaf set)
    if "dora_scale" in leaves:
        if leaves <= _DORA_LEAVES:
            return "dora"
    elif "oft_blocks" in leaves:
        if leaves <= _OFT_LEAVES:
            return "oft"
    elif "diff" in leaves or "diff_b" in leaves:
        if leaves <= _FULL_LEAVES:
            return "full"
    elif "w_norm" in leaves or "b_norm" in leaves:
        if leaves <= _NORM_LEAVES:
            return "norm"
    elif {"a1", "a2", "b1", "b2"} & leaves:
        if leaves <= _GLORA_LEAVES:
            return "glora"
    else:
        for algo, known in (("lora", _LORA_LEAVES), ("loha", _LOHA_LEAVES),
                            ("lokr", _LOKR_LEAVES), ("ia3", _IA3_LEAVES)):
            if leaves <= known:
                return algo
    raise ValueError(
        f"kohya module {base!r} has unsupported factor tensors "
        f"{sorted(leaves)} (LoHa++/mixed algorithms?); refusing a partial "
        f"load")


def _site_shape(site: Site) -> Tuple[int, ...]:
    if site.kind == "linear":
        return (site.out_dim, site.in_dim)
    return (site.out_dim, site.in_dim) + tuple(site.kernel)


def _rebuild_tucker(t: np.ndarray, wa: np.ndarray,
                    wb: np.ndarray) -> np.ndarray:
    """(r, r, kh, kw) core x (r, out) x (r, in) -> (out, in, kh, kw)."""
    return np.einsum("ijkl,ip,jr->prkl", t, wa, wb)


def _compose_loha(base: str, site: Site,
                  g: Dict[str, np.ndarray]) -> np.ndarray:
    need = {"hada_w1_a", "hada_w1_b", "hada_w2_a", "hada_w2_b"}
    if not need <= set(g):
        raise ValueError(f"LoHa module {base!r} is missing factors "
                         f"{sorted(need - set(g))}")
    if ("hada_t1" in g) != ("hada_t2" in g):
        raise ValueError(f"LoHa module {base!r} has a Tucker core on only "
                         f"one side")
    if "hada_t1" in g:
        if site.kind != "conv":
            raise ValueError(f"LoHa module {base!r} has Tucker cores but "
                             f"maps to a linear site")
        m1 = _rebuild_tucker(g["hada_t1"], g["hada_w1_a"], g["hada_w1_b"])
        m2 = _rebuild_tucker(g["hada_t2"], g["hada_w2_a"], g["hada_w2_b"])
        r = g["hada_w1_b"].shape[0]
    else:
        m1 = g["hada_w1_a"] @ g["hada_w1_b"]
        m2 = g["hada_w2_a"] @ g["hada_w2_b"]
        r = g["hada_w1_b"].shape[0]
    if m1.shape != m2.shape:
        raise ValueError(f"LoHa module {base!r}: factor shapes disagree "
                         f"({m1.shape} vs {m2.shape})")
    alpha = float(np.asarray(g.get("alpha", r)))
    return (m1 * m2).reshape(_site_shape(site)) * (alpha / r)


def _compose_lokr(base: str, site: Site,
                  g: Dict[str, np.ndarray]) -> np.ndarray:
    if "lokr_w1" in g:
        if "lokr_w1_a" in g or "lokr_w1_b" in g:
            raise ValueError(f"LoKr module {base!r} has both a full w1 and "
                             f"w1 factors")
        w1 = g["lokr_w1"]
        r1 = None
    elif "lokr_w1_a" in g and "lokr_w1_b" in g:
        w1 = g["lokr_w1_a"] @ g["lokr_w1_b"]
        r1 = g["lokr_w1_b"].shape[0]
    else:
        raise ValueError(f"LoKr module {base!r} is missing w1")
    if "lokr_t2" in g:
        if site.kind != "conv":
            raise ValueError(f"LoKr module {base!r} has a Tucker core but "
                             f"maps to a linear site")
        if not {"lokr_w2_a", "lokr_w2_b"} <= set(g):
            raise ValueError(f"LoKr module {base!r} has lokr_t2 without "
                             f"w2 factors")
        w2 = _rebuild_tucker(g["lokr_t2"], g["lokr_w2_a"], g["lokr_w2_b"])
        r2 = g["lokr_w2_b"].shape[0]
    elif "lokr_w2" in g:
        w2 = g["lokr_w2"]
        r2 = None
    elif "lokr_w2_a" in g and "lokr_w2_b" in g:
        w2 = g["lokr_w2_a"] @ g["lokr_w2_b"]
        r2 = g["lokr_w2_b"].shape[0]
    else:
        raise ValueError(f"LoKr module {base!r} is missing w2")
    if w1.ndim != 2:
        raise ValueError(f"LoKr module {base!r}: w1 must be 2-D, got "
                         f"{w1.shape}")
    # the webui multiplier: alpha/r applies only when a factored side
    # defines a rank (w1 factors win, then w2 — matching the loaders the
    # ecosystem runs); fully-materialized w1 AND w2 ignore alpha
    r = r1 if r1 is not None else r2
    alpha = float(np.asarray(g.get("alpha", r if r else 1.0)))
    scale = (alpha / r) if r else 1.0
    if w2.ndim == 4:
        w1 = w1[:, :, None, None]
    delta = np.kron(w1, w2)
    want = _site_shape(site)
    if int(np.prod(delta.shape)) != int(np.prod(want)):
        raise ValueError(
            f"LoKr module {base!r}: kron factor shapes compose to "
            f"{delta.shape}, site needs {want}")
    return delta.reshape(want) * scale


def _compose_ia3(base: str, site: Site, g: Dict[str, np.ndarray],
                 base_weight: np.ndarray) -> np.ndarray:
    if not {"weight", "on_input"} <= set(g):
        raise ValueError(f"IA3 module {base!r} needs 'weight' and "
                         f"'on_input' tensors")
    v = np.asarray(g["weight"], np.float32).reshape(-1)
    on_input = bool(np.asarray(g["on_input"]))
    w = np.asarray(base_weight, np.float32)
    axis_dim = site.in_dim if on_input else site.out_dim
    if v.shape[0] != axis_dim:
        raise ValueError(
            f"IA3 module {base!r}: gain has {v.shape[0]} channels, the "
            f"{'input' if on_input else 'output'} axis has {axis_dim}")
    shape = [1] * w.ndim
    shape[1 if on_input else 0] = axis_dim
    return w * v.reshape(shape)


def _lora_delta_weightspace(base: str, site: Site,
                            g: Dict[str, np.ndarray]) -> np.ndarray:
    """Materialize a plain (up, down[, mid]) kohya pair as its exact
    weight-space delta: dW = up . down * alpha/r in the site's geometry
    (a kxk down conv followed by a 1x1 up composes into one kxk kernel)."""
    if not {"lora_up", "lora_down"} <= set(g):
        raise ValueError(f"kohya module {base!r} is missing "
                         f"lora_up/lora_down factors")
    up = np.asarray(g["lora_up"], np.float32)
    down = np.asarray(g["lora_down"], np.float32)
    if "lora_mid" in g:
        down = _compose_cp_mid(base, site,
                               np.asarray(g["lora_mid"], np.float32), down)
    r = down.shape[0]
    alpha = float(np.asarray(g.get("alpha", r)))
    want = _site_shape(site)
    prod = up.reshape(up.shape[0], -1) @ down.reshape(r, -1)
    if prod.size != int(np.prod(want)):
        raise ValueError(
            f"kohya module {base!r}: factors compose to {prod.shape}, "
            f"site needs {want}")
    return prod.reshape(want) * (alpha / r)


def _compose_dora(base: str, site: Site, g: Dict[str, np.ndarray],
                  base_weight: np.ndarray) -> np.ndarray:
    """DoRA merged weight: m * (W + dW) / ||W + dW||_row — row norm per
    output channel over all remaining axes + fp32 eps (the LyCORIS
    weight-decompose / PEFT DoRA algebra). Returns W' - W."""
    w = np.asarray(base_weight, np.float32).reshape(_site_shape(site))
    m = np.asarray(g["dora_scale"], np.float32).reshape(-1)
    if m.shape[0] != site.out_dim:
        raise ValueError(
            f"DoRA module {base!r}: dora_scale has {m.shape[0]} channels, "
            f"the output axis has {site.out_dim}")
    wp = w + _lora_delta_weightspace(base, site, g)
    norm = np.linalg.norm(wp.reshape(wp.shape[0], -1), axis=1)
    norm = norm + np.finfo(np.float32).eps
    bshape = (site.out_dim,) + (1,) * (wp.ndim - 1)
    merged = m.reshape(bshape) * wp / norm.reshape(bshape)
    return merged - w


def _apply_rescale(base: str, site: Site, g: Dict[str, np.ndarray],
                   merged: np.ndarray) -> np.ndarray:
    """The LyCORIS 'rescaled' OFT variant's per-output-channel gain."""
    if "rescale" not in g:
        return merged
    s = np.asarray(g["rescale"], np.float32).reshape(-1)
    if s.shape[0] != site.out_dim:
        raise ValueError(
            f"OFT module {base!r}: rescale has {s.shape[0]} channels, "
            f"the output axis has {site.out_dim}")
    return merged * s.reshape((site.out_dim,) + (1,) * (merged.ndim - 1))


def _clamped_cayley(q: np.ndarray, alpha, out_dim: int) -> np.ndarray:
    """Skew-symmetrize the trailing (b, b) blocks, apply the global
    Frobenius constraint ||Q||_F <= alpha * out_dim (when alpha > 0), and
    Cayley-map each block to a rotation R = (I+Q)(I-Q)^-1."""
    skew = q - np.swapaxes(q, -1, -2)
    if alpha is not None and float(np.asarray(alpha)) > 0:
        # sd-scripts/LyCORIS: constraint = alpha * out_dim, clamp ||Q||_F
        # over ALL blocks — and for BOFT over all STAGES too: get_r calls
        # torch.norm on the whole (m, n, b, b) tensor, one global factor
        # (granularity pinned by test_boft_alpha_clamp_is_global; eps 1e-8
        # matching their clamp arithmetic)
        constraint = float(np.asarray(alpha)) * out_dim
        n = float(np.linalg.norm(skew))
        skew = skew * ((min(n, constraint) + 1e-8) / (n + 1e-8))
    eye = np.eye(q.shape[-1], dtype=np.float32)
    return np.matmul(eye + skew, np.linalg.inv(eye - skew))


def _compose_boft(base: str, site: Site, g: Dict[str, np.ndarray],
                  base_weight: np.ndarray) -> np.ndarray:
    """BOFT merged weight (LyCORIS modules/boft.py make_weight): m stages
    of butterfly-permuted block rotations of the output channels. Stage i
    permutes channels (c, g=2, k=2^i*b/2) -> (c, k, g), rotates blocks of
    b via the Cayley map (R @ w per block — BOFT's convention, transposed
    vs diag-OFT's), and un-permutes. Returns W' - W.

    Note on fractional scales: LyCORIS lerps stage 0's ROTATION toward the
    identity at multiplier<1; our tree lerps the merged DELTA. The two
    agree exactly at scale 0 and 1 and differ only in between (the same
    class of approximation the webui applies to OFT multipliers)."""
    q = np.asarray(g["oft_blocks"], np.float32)  # (m, n_blocks, b, b)
    m, n, b, b2 = q.shape
    out_dim = site.out_dim
    if b != b2 or b % 2 or n * b != out_dim:
        raise ValueError(
            f"BOFT module {base!r}: oft_blocks (m, n, b, b) = {q.shape} "
            f"must have square even-sized blocks with n*b == out_dim "
            f"({out_dim})")
    rot = _clamped_cayley(q, g.get("alpha"), out_dim)  # (m, n, b, b)
    w = np.asarray(base_weight, np.float32).reshape(_site_shape(site))
    inp = w.reshape(out_dim, -1)
    r_b = b // 2
    for i in range(m):
        k = (2 ** i) * r_b
        if out_dim % (2 * k):
            raise ValueError(
                f"BOFT module {base!r}: stage {i} butterfly needs "
                f"out_dim divisible by {2 * k}, got {out_dim}")
        c = out_dim // (2 * k)
        # (c g k) -> (c k g): interleave the two butterfly wings
        inp = inp.reshape(c, 2, k, -1).transpose(0, 2, 1, 3)
        # rotate blocks of b: einsum('bij,bj...->bi...', R_i, w)
        inp = inp.reshape(n, b, -1)
        inp = np.einsum("bij,bjr->bir", rot[i], inp)
        # (c k g) -> (c g k): undo the interleave
        inp = inp.reshape(c, k, 2, -1).transpose(0, 2, 1, 3)
        inp = inp.reshape(out_dim, -1)
    merged = _apply_rescale(base, site, g, inp.reshape(w.shape))
    return merged - w


def _compose_oft(base: str, site: Site, g: Dict[str, np.ndarray],
                 base_weight: np.ndarray) -> np.ndarray:
    """diag-OFT merged weight: per-block Cayley rotation of the output
    channels (kohya sd-scripts networks/oft.py construction) with the
    optional LyCORIS rescale gain. 4-D oft_blocks (butterfly stages)
    dispatch to _compose_boft. Returns W' - W."""
    q = np.asarray(g["oft_blocks"], np.float32)
    if q.ndim == 4:
        return _compose_boft(base, site, g, base_weight)
    if q.ndim != 3 or q.shape[1] != q.shape[2]:
        raise ValueError(
            f"OFT module {base!r}: oft_blocks must be (num_blocks, b, b) "
            f"or BOFT's (m, num_blocks, b, b), got {q.shape}")
    k, b, _ = q.shape
    if k * b != site.out_dim:
        raise ValueError(
            f"OFT module {base!r}: {k} blocks of size {b} cover "
            f"{k * b} channels, the output axis has {site.out_dim}")
    rot = _clamped_cayley(q, g.get("alpha"), site.out_dim)
    w = np.asarray(base_weight, np.float32).reshape(_site_shape(site))
    merged = np.einsum("knm,knr->kmr", rot,
                       w.reshape(k, b, -1)).reshape(w.shape)
    merged = _apply_rescale(base, site, g, merged)
    return merged - w


def _compose_glora(base: str, site: Site, g: Dict[str, np.ndarray],
                   base_weight: np.ndarray) -> np.ndarray:
    """GLoRA merged delta (the GLoRA paper's W' = W + W.A + B as LyCORIS
    modules/glora.py factors it): A = a2 @ a1 acts on the INPUT of the
    frozen weight, B = b2 @ b1 is a plain low-rank bypass;
    dW = (W @ A + B) * alpha/r. For convs a1/a2/b1 are 1x1 (squeezed to
    2-D) and b2 carries the site's kernel."""
    need = {"a1", "a2", "b1", "b2"}
    if not need <= set(g):
        raise ValueError(f"GLoRA module {base!r} is missing factors "
                         f"{sorted(need - set(g))}")
    a1 = np.asarray(g["a1"], np.float32)
    a2 = np.asarray(g["a2"], np.float32)
    b1 = np.asarray(g["b1"], np.float32)
    b2 = np.asarray(g["b2"], np.float32)
    r = a1.shape[0]
    if a1.ndim == 4:  # conv factors: a1/a2/b1 must be 1x1 bottlenecks
        for name, t in (("a1", a1), ("a2", a2), ("b1", b1)):
            if t.shape[2:] != (1, 1):
                raise ValueError(
                    f"GLoRA module {base!r}: {name} must be a 1x1 conv, "
                    f"got kernel {t.shape[2:]}")
        a1, a2, b1 = a1[..., 0, 0], a2[..., 0, 0], b1[..., 0, 0]
    w = np.asarray(base_weight, np.float32).reshape(_site_shape(site))
    A = a2 @ a1  # (in, in)
    if A.shape != (site.in_dim, site.in_dim):
        raise ValueError(
            f"GLoRA module {base!r}: a2 @ a1 composes to {A.shape}, the "
            f"input axis has {site.in_dim}")
    if site.kind == "conv":
        # W @ A over the input-channel axis, keeping the spatial taps
        wa = np.einsum("oihw,ij->ojhw", w, A)
        if b2.shape != w.shape[:1] + (r,) + w.shape[2:]:
            raise ValueError(
                f"GLoRA module {base!r}: b2 {b2.shape} must carry the "
                f"site kernel {w.shape[2:]} over rank {r}")
        bb = np.einsum("orhw,ri->oihw", b2, b1)
    else:
        wa = w @ A
        bb = b2 @ b1
    if bb.shape != w.shape:
        raise ValueError(
            f"GLoRA module {base!r}: b2 @ b1 composes to {bb.shape}, "
            f"the site needs {w.shape}")
    alpha = float(np.asarray(g.get("alpha", r)))
    return (wa + bb) * (alpha / r)


def _compose_full(base: str, site: Site,
                  g: Dict[str, np.ndarray]) -> np.ndarray:
    """Full-module weight delta: `diff` IS W_tuned - W_base (LyCORIS
    modules/full.py); alpha is ignored by loaders (the diff is absolute).
    The optional bias delta `diff_b` rides the param-delta channel."""
    if "diff" not in g:
        raise ValueError(
            f"full module {base!r} has only a bias diff; refusing (the "
            f"weight diff is mandatory in LyCORIS full modules)")
    return np.asarray(g["diff"], np.float32)


def _mangled_param_index(prefix: str, params) -> Dict[str, str]:
    """kohya module base -> model param path-prefix, for modules OUTSIDE
    the matmul site registry (norm layers). Built from the params dict so
    the underscore-mangling is inverted exactly (paths contain digits, so
    string un-mangling alone is ambiguous)."""
    out: Dict[str, str] = {}
    for k in params:
        if k.endswith(".weight"):
            path = k[: -len(".weight")]
            out[prefix + "_" + path.replace(".", "_")] = path
    return out


def _parse_groups(f: SafetensorsFile) -> Dict[str, Dict[str, np.ndarray]]:
    """Group a LyCORIS file's keys per module base, accepting every factor
    leaf any supported algorithm uses; anything else raises."""
    groups: Dict[str, Dict[str, np.ndarray]] = {}
    for k in f.keys():
        base, _, leaf = k.rpartition(".")
        if leaf == "weight" and base.endswith((".lora_up", ".lora_down",
                                               ".lora_mid", ".a1", ".a2",
                                               ".b1", ".b2")):
            base, _, which = base.rpartition(".")
            groups.setdefault(base, {})[which] = f.get_tensor(k)
        elif leaf in ("alpha", "weight", "on_input", "dora_scale",
                      "oft_blocks", "rescale", "diff", "diff_b",
                      "w_norm", "b_norm") or \
                leaf.startswith(("hada_", "lokr_")):
            groups.setdefault(base, {})[leaf] = f.get_tensor(k)
        else:
            raise ValueError(f"unrecognized LyCORIS key {k!r}")
    return groups


def load_lycoris(
    path: str,
    *,
    unet_sites: Optional[Sequence[Site]] = None,
    text_sites: Optional[Sequence[Site]] = None,
    unet_params: Optional[Dict[str, np.ndarray]] = None,
    text_params: Optional[Dict[str, np.ndarray]] = None,
    dtype=np.float32,
) -> Tuple[Optional[LoraTree], Optional[LoraTree]]:
    """Load a LyCORIS file with per-module algorithm dispatch. Returns
    (lora_unet, lora_text); a model whose sites are not given (or with no
    keys in the file) comes back None. Plain LoRA/LoCon modules stay
    factored (up, down) entries; LoHa/LoKr/IA3/DoRA/diag-OFT modules
    become exact full-rank {"delta"} entries. IA3/DoRA/OFT modules need
    the corresponding `*_params` (their deltas are
    base-weight-dependent)."""
    import jax.numpy as jnp

    with SafetensorsFile(path) as f:
        groups = _parse_groups(f)

        foreign = [b for b in groups
                   if not any(b.startswith(p + "_")
                              for p in _PREFIX.values())]
        if foreign:
            raise ValueError(
                f"LyCORIS file has modules under unknown prefixes "
                f"(SDXL/unsupported model?): {sorted(foreign)[:5]}"
                f"{'...' if len(foreign) > 5 else ''}")

        out = {}
        for model, sites, params in (
                ("unet", unet_sites, unet_params),
                ("text_encoder", text_sites, text_params)):
            if sites is None:
                out[model] = None
                continue
            index = _site_index(model, sites)
            out[model] = _load_model_groups(
                model, _PREFIX[model], groups, index, sites, params, dtype)
    return out["unet"], out["text_encoder"]


def _load_model_groups(model, prefix, groups, index, sites, params, dtype):
    """One model's tree from a parsed LyCORIS file: matmul-site modules
    dispatch per algorithm; norm modules (outside the site registry)
    resolve against the model's param index and ride the tree's
    `param_deltas` channel (applied to base params by the pipes)."""
    import jax.numpy as jnp

    present = {b: g for b, g in groups.items() if b in index}
    leftover = [b for b in groups
                if b.startswith(prefix + "_") and b not in index]
    norm_bases = [b for b in leftover
                  if {"w_norm", "b_norm"} & set(groups[b])]
    unknown = [b for b in leftover if b not in norm_bases]
    if unknown:
        raise ValueError(
            f"LyCORIS file has {model} modules outside the known "
            f"site set: {sorted(unknown)[:5]}"
            f"{'...' if len(unknown) > 5 else ''}")
    pdeltas: Dict[str, np.ndarray] = {}
    if norm_bases:
        pindex = _mangled_param_index(prefix, params or {})
        pdeltas = _norm_param_deltas(model, norm_bases, groups, pindex,
                                     params)
    entries, pd2 = _entries_for_sites(model, present, index, sites,
                                      params, dtype)
    pdeltas.update(pd2)
    if not entries and not pdeltas:
        return None
    tree = {"sites": entries, "scale": jnp.asarray(1.0, jnp.float32)}
    if pdeltas:
        tree["param_deltas"] = pdeltas
    return tree


def _entries_for_sites(model, present, index, sites, params, dtype):
    """Per-site algorithm dispatch shared by the SD1.x/2.x and SDXL
    loaders: `present` maps kohya module bases to their factor groups,
    `index` maps those bases to Sites. Returns (entries, param_deltas)
    where param_deltas carries full-module BIAS diffs keyed by flat param
    path (site weights become delta entries; biases are not sites)."""
    import jax.numpy as jnp

    by_name = {index[b].name: b for b in present}
    entries = {}
    param_deltas: Dict[str, np.ndarray] = {}
    for s in sites:
        base = by_name.get(s.name)
        if base is None:
            continue
        g = present[base]
        algo = _detect_algo(base, set(g))
        if algo == "lora":
            if not {"lora_up", "lora_down"} <= set(g):
                raise ValueError(
                    f"kohya module {base!r} is missing "
                    f"lora_up/lora_down factors")
            up = np.asarray(g["lora_up"], np.float32)
            down = np.asarray(g["lora_down"], np.float32)
            if "lora_mid" in g:
                down = _compose_cp_mid(
                    base, s, np.asarray(g["lora_mid"], np.float32),
                    down)
            alpha = float(np.asarray(g.get("alpha", down.shape[0])))
            up = up * (alpha / down.shape[0])
            entries[s.name] = {"up": jnp.asarray(up, dtype),
                               "down": jnp.asarray(down, dtype)}
            continue
        if algo in ("ia3", "dora", "oft", "glora"):
            if params is None:
                raise ValueError(
                    f"{algo.upper()} module {base!r} needs the "
                    f"{model} base weights to compose its delta; "
                    f"pass {model}_params")
            bw = params.get(s.name + ".weight")
            if bw is None:
                raise ValueError(
                    f"{algo.upper()} module {base!r}: no base "
                    f"weight {s.name + '.weight'!r} in {model} "
                    f"params")
        if algo == "full":
            delta = _compose_full(base, s, g)
            if "diff_b" in g:
                bk = s.name + ".bias"
                if params is None:
                    raise ValueError(
                        f"full module {base!r} carries a bias diff; pass "
                        f"{model}_params so it can be checked against the "
                        f"base bias")
                if bk not in params:
                    raise ValueError(
                        f"full module {base!r} has a bias diff but the "
                        f"{model} site {s.name!r} has no bias parameter")
                db = np.asarray(g["diff_b"], np.float32)
                bshape = tuple(np.shape(params[bk]))
                if db.shape != bshape:
                    raise ValueError(
                        f"full module {base!r}: diff_b {db.shape} vs base "
                        f"bias {bshape}")
                param_deltas[bk] = db
            want = _site_shape(s)
            if tuple(delta.shape) != want:
                raise ValueError(
                    f"LyCORIS module {base!r} composes to "
                    f"{delta.shape}, site {s.name} needs {want}")
            entries[s.name] = {"delta": jnp.asarray(delta, dtype)}
            continue
        if algo == "loha":
            delta = _compose_loha(
                base, s, {k: np.asarray(v, np.float32)
                          if k != "on_input" else v
                          for k, v in g.items()})
        elif algo == "lokr":
            delta = _compose_lokr(
                base, s, {k: np.asarray(v, np.float32)
                          for k, v in g.items()})
        elif algo == "dora":
            delta = _compose_dora(base, s, g, np.asarray(bw))
        elif algo == "oft":
            delta = _compose_oft(base, s, g, np.asarray(bw))
        elif algo == "glora":
            delta = _compose_glora(base, s, g, np.asarray(bw))
        elif algo == "norm":
            raise ValueError(
                f"norm module {base!r} targets a matmul site {s.name!r} — "
                f"w_norm/b_norm belong on normalization layers")
        else:  # ia3
            delta = _compose_ia3(base, s, g, np.asarray(bw))
        want = _site_shape(s)
        if tuple(delta.shape) != want:
            raise ValueError(
                f"LyCORIS module {base!r} composes to "
                f"{delta.shape}, site {s.name} needs {want}")
        entries[s.name] = {"delta": jnp.asarray(delta, dtype)}
    return entries, param_deltas


def _norm_param_deltas(model, bases, groups, pindex, params):
    """Resolve norm-module groups (w_norm/b_norm deltas on GroupNorm/
    LayerNorm layers — LyCORIS modules/norms.py, train_norm=True) to flat
    param-path deltas. Norm layers are not matmul sites, so they resolve
    against the model's own param index; the merged weights are
    w + w_norm * scale / b + b_norm * scale — linear in scale, so the
    pipes' lerp application is the exact LyCORIS multiplier semantics."""
    out: Dict[str, np.ndarray] = {}
    for base in bases:
        g = groups[base]
        if params is None:
            raise ValueError(
                f"norm module {base!r} needs {model}_params to resolve "
                f"its layer path and check shapes")
        pbase = pindex.get(base)
        if pbase is None:
            raise ValueError(
                f"norm module {base!r} does not match any {model} "
                f"parameter path")
        for leaf, suffix in (("w_norm", ".weight"), ("b_norm", ".bias")):
            if leaf not in g:
                continue
            key = pbase + suffix
            if key not in params:
                raise ValueError(
                    f"norm module {base!r}: the {model} layer has no "
                    f"{suffix[1:]} parameter {key!r}")
            d = np.asarray(g[leaf], np.float32)
            want = tuple(np.shape(params[key]))
            if d.shape != want:
                raise ValueError(
                    f"norm module {base!r}: {leaf} {d.shape} vs base "
                    f"{want}")
            out[key] = d
    return out


def load_lycoris_xl(
    path: str,
    *,
    unet_cfg,
    unet_sites: Optional[Sequence[Site]] = None,
    text_sites: Optional[Sequence[Site]] = None,
    text2_sites: Optional[Sequence[Site]] = None,
    unet_params: Optional[Dict[str, np.ndarray]] = None,
    text_params: Optional[Dict[str, np.ndarray]] = None,
    text2_params: Optional[Dict[str, np.ndarray]] = None,
    dtype=np.float32,
) -> Tuple[Optional[LoraTree], Optional[LoraTree], Optional[LoraTree]]:
    """SDXL-flavor LyCORIS: the same per-module algorithm dispatch as
    load_lycoris over the SDXL kohya key layout (LDM
    input/middle/output_blocks unet names + lora_te1_/lora_te2_ text
    prefixes — formats/kohya._xl_index). Returns (lora_unet, lora_te1,
    lora_te2) with the same loud-failure contract; IA3/DoRA/OFT modules
    need the matching `*_params`."""
    import jax.numpy as jnp

    from .kohya import _PREFIX_XL, _xl_index

    with SafetensorsFile(path) as f:
        groups = _parse_groups(f)
        foreign = [b for b in groups
                   if not any(b.startswith(p + "_")
                              for p in _PREFIX_XL.values())]
        if foreign:
            raise ValueError(
                f"SDXL LyCORIS file has modules under unknown prefixes: "
                f"{sorted(foreign)[:5]}{'...' if len(foreign) > 5 else ''}")
        out = {}
        for model, sites, params in (
                ("unet", unet_sites, unet_params),
                ("text_encoder", text_sites, text_params),
                ("text_encoder_2", text2_sites, text2_params)):
            if sites is None:
                out[model] = None
                continue
            index = _xl_index(model, sites, unet_cfg)
            out[model] = _load_model_groups(
                model, _PREFIX_XL[model], groups, index, sites, params,
                dtype)
    return out["unet"], out["text_encoder"], out["text_encoder_2"]
