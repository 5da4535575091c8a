"""Training: loss function semantics, optimizer groups, jitted train step,
and data-parallel equivalence on the virtual 8-device mesh.

CPU note: each distinct loss graph is expensive to evaluate eagerly, so the
loss-semantics checks are consolidated to minimize trace/compile count.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lora_tpu.core.lora import init_lora
from lora_tpu.core.sites import text_encoder_lora_sites, unet_lora_sites
from lora_tpu.models import schedulers
from lora_tpu.models.clip import init_clip_text
from lora_tpu.models.config import TINY_TEXT, TINY_UNET, TINY_VAE
from lora_tpu.models.unet import init_unet
from lora_tpu.models.vae import init_vae
from lora_tpu.parallel import mesh as mesh_lib
from lora_tpu.training.loss import LossConfig, loss_step
from lora_tpu.training.optim import make_lr_schedule, make_optimizer
from lora_tpu.training.train_step import make_train_step, ti_norm_prior

SCHED = schedulers.make_schedule()


@pytest.fixture(scope="module")
def base():
    return (init_unet(TINY_UNET, jax.random.PRNGKey(0)),
            init_clip_text(TINY_TEXT, jax.random.PRNGKey(1)),
            init_vae(TINY_VAE, jax.random.PRNGKey(2)))


def make_trainable(r=2, seed=5, with_ti=False):
    t = {
        "lora_unet": init_lora(unet_lora_sites(TINY_UNET), r=r,
                               rng=jax.random.PRNGKey(seed)),
        "lora_text": init_lora(text_encoder_lora_sites(TINY_TEXT), r=r,
                               rng=jax.random.PRNGKey(seed + 1)),
    }
    if with_ti:
        t["ti"] = {"embeds": jax.random.normal(
            jax.random.PRNGKey(seed + 2), (2, TINY_TEXT.hidden_size)) * 0.02}
    return t


def make_batch(bsz=2, seed=7, with_mask=False):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    batch = {
        "latents": jax.random.normal(ks[0], (bsz, 8, 8, 4)),
        "input_ids": jax.random.randint(ks[1], (bsz, 7), 0, 900),
    }
    if with_mask:
        batch["mask"] = (jax.random.uniform(ks[2], (bsz, 64, 64, 1)) > 0.5
                         ).astype(jnp.float32)
    return batch


def loss_kwargs(base, **over):
    unet_p, text_p, vae_p = base
    kw = dict(unet_params=unet_p, text_params=text_p, vae_params=vae_p,
              unet_cfg=TINY_UNET, text_cfg=TINY_TEXT, vae_cfg=TINY_VAE,
              sched=SCHED, cfg=LossConfig())
    kw.update(over)
    return kw


def test_loss_semantics(base):
    """One consolidated pass over the loss variants (each variant is a
    distinct XLA graph — expensive on CPU, so batched into one test):
    finiteness, grads flow only into trainables, mask weighting, prior
    preservation split, v-prediction."""
    trainable = make_trainable()
    batch = make_batch()
    rng = jax.random.PRNGKey(0)

    loss, grads = jax.value_and_grad(
        lambda t: loss_step(t, batch, rng, **loss_kwargs(base)))(trainable)
    assert np.isfinite(float(loss))
    gu = grads["lora_unet"]["sites"]
    some_up = next(iter(gu.values()))["up"]
    assert np.abs(np.asarray(some_up)).max() > 0
    # down grad is zero because up is zero-init (chain rule through 0 matrix)
    some_down = next(iter(gu.values()))["down"]
    np.testing.assert_allclose(np.asarray(some_down), 0.0, atol=1e-8)

    # mask weighting changes the value
    l_mask = loss_step(trainable, make_batch(with_mask=True), rng,
                       **loss_kwargs(base))
    assert abs(float(loss) - float(l_mask)) > 1e-6

    # prior preservation: weight=1 adds the class half
    b4 = make_batch(bsz=4)
    l_p0 = loss_step(trainable, b4, rng, **loss_kwargs(
        base, cfg=LossConfig(with_prior_preservation=True,
                             prior_loss_weight=0.0)))
    l_p1 = loss_step(trainable, b4, rng, **loss_kwargs(
        base, cfg=LossConfig(with_prior_preservation=True,
                             prior_loss_weight=1.0)))
    assert float(l_p1) > float(l_p0)

    # v-prediction is a different target
    sched_v = schedulers.make_schedule(prediction_type="v_prediction")
    l_v = loss_step(trainable, batch, rng, **loss_kwargs(base, sched=sched_v))
    assert np.isfinite(float(l_v)) and abs(float(l_v) - float(loss)) > 1e-6


def test_train_step_descends(base):
    trainable = make_trainable(with_ti=True)
    ti_ids = jnp.array([998, 999])
    opt = make_optimizer(trainable, {"lora_unet": 1e-3, "lora_text": 5e-4,
                                     "ti": 5e-3})
    step = make_train_step(unet_cfg=TINY_UNET, text_cfg=TINY_TEXT,
                           vae_cfg=TINY_VAE, sched=SCHED,
                           loss_cfg=LossConfig(), optimizer=opt,
                           ti_ids=ti_ids)
    opt_state = opt.init(trainable)
    batch = make_batch(bsz=2)
    losses = []
    for i in range(8):
        trainable, opt_state, loss = step(trainable, opt_state, base, batch,
                                          jax.random.PRNGKey(42))  # fixed rng
        losses.append(float(loss))
    assert losses[-1] < losses[0]  # overfits the fixed batch/noise


def test_grad_accum_matches_big_batch():
    """MultiSteps(k=2) over two micro-grads == one step on their mean.
    (Toy trainable; the contract is optimizer-level, model-free.)"""
    trainable = {"lora_unet": {"w": jnp.ones((4, 4))}}
    g1 = {"lora_unet": {"w": jnp.full((4, 4), 0.5)}}
    g2 = {"lora_unet": {"w": jnp.full((4, 4), 1.5)}}
    avg = jax.tree_util.tree_map(lambda a, b: (a + b) / 2, g1, g2)

    opt = make_optimizer(trainable, {"lora_unet": 1e-3}, grad_accum=2,
                         max_grad_norm=None)
    st = opt.init(trainable)
    _, st = opt.update(g1, st, trainable)
    up2, st = opt.update(g2, st, trainable)

    opt_ref = make_optimizer(trainable, {"lora_unet": 1e-3},
                             max_grad_norm=None)
    up_ref, _ = opt_ref.update(avg, opt_ref.init(trainable), trainable)
    np.testing.assert_allclose(np.asarray(up2["lora_unet"]["w"]),
                               np.asarray(up_ref["lora_unet"]["w"]),
                               rtol=1e-5, atol=1e-7)


def test_ti_norm_prior():
    emb = jnp.array([[3.0, 4.0], [0.1, 0.0]])  # norms 5.0, 0.1
    out = ti_norm_prior(emb, lr=1.0, target_norm=0.4)  # lambda=1 -> exact 0.4
    norms = np.linalg.norm(np.asarray(out), axis=-1)
    np.testing.assert_allclose(norms, [0.4, 0.4], rtol=1e-5)
    out2 = ti_norm_prior(emb, lr=1e-3, target_norm=0.4)  # lambda=0.1
    norms2 = np.linalg.norm(np.asarray(out2), axis=-1)
    np.testing.assert_allclose(norms2, [5.0 + 0.1 * (0.4 - 5.0),
                                        0.1 + 0.1 * (0.4 - 0.1)], rtol=1e-5)


def test_lr_schedules():
    s = make_lr_schedule("linear", 1e-3, 100, warmup_steps=10)
    assert float(s(0)) == 0.0
    np.testing.assert_allclose(float(s(10)), 1e-3, rtol=1e-5)
    assert float(s(100)) < 2e-4
    c = make_lr_schedule("constant", 1e-4, 100)
    assert float(c(50)) == pytest.approx(1e-4)


# ---------------------------------------------------------------------------
# data parallel on the virtual mesh
# ---------------------------------------------------------------------------

def test_dp_train_step_matches_single_device(base):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = mesh_lib.make_mesh(dp=8)
    trainable = make_trainable()
    opt = make_optimizer(trainable, {"lora_unet": 1e-3, "lora_text": 1e-3},
                         max_grad_norm=None)
    batch = make_batch(bsz=8, seed=13)
    rng = jax.random.PRNGKey(3)

    step1 = make_train_step(unet_cfg=TINY_UNET, text_cfg=TINY_TEXT,
                            vae_cfg=TINY_VAE, sched=SCHED,
                            loss_cfg=LossConfig(), optimizer=opt)
    t1, _, l1 = step1(jax.tree_util.tree_map(jnp.copy, trainable),
                      opt.init(trainable), base, batch, rng)

    stepN = make_train_step(unet_cfg=TINY_UNET, text_cfg=TINY_TEXT,
                            vae_cfg=TINY_VAE, sched=SCHED,
                            loss_cfg=LossConfig(), optimizer=opt, mesh=mesh)
    sharded_batch = mesh_lib.shard_batch(batch, mesh)
    t8, _, l8 = stepN(mesh_lib.replicate_tree(
        jax.tree_util.tree_map(jnp.copy, trainable), mesh),
        mesh_lib.replicate_tree(opt.init(trainable), mesh),
        base, sharded_batch, rng)

    np.testing.assert_allclose(float(l1), float(l8), rtol=1e-4)
    a = np.asarray(t1["lora_unet"]["sites"][next(iter(
        t1["lora_unet"]["sites"]))]["down"])
    b = np.asarray(t8["lora_unet"]["sites"][next(iter(
        t8["lora_unet"]["sites"]))]["down"])
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_fsdp_param_sharding_preserves_forward(base):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from lora_tpu.models.unet import unet_forward

    mesh = mesh_lib.make_mesh(dp=2, fsdp=4)
    unet_p = base[0]
    sharded = mesh_lib.shard_params(unet_p, mesh, use_fsdp=True)
    sample = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4))
    t = jnp.array([5, 10])
    ctx = jax.random.normal(jax.random.PRNGKey(1),
                            (2, 7, TINY_UNET.cross_attention_dim))
    out_ref = unet_forward(unet_p, sample, t, ctx, TINY_UNET)
    out_sh = unet_forward(sharded, sample, t, ctx, TINY_UNET)
    np.testing.assert_allclose(np.asarray(out_ref), np.asarray(out_sh),
                               rtol=2e-4, atol=1e-5)


def test_mesh_from_flags_and_batch_guard():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    assert mesh_lib.mesh_from_flags() is None
    m = mesh_lib.mesh_from_flags(data_parallel=True)
    assert m.shape["dp"] == 8
    m2 = mesh_lib.mesh_from_flags(data_parallel=True, fsdp=2, tp=2)
    assert (m2.shape["dp"], m2.shape["fsdp"], m2.shape["tp"]) == (2, 2, 2)
    with pytest.raises(ValueError, match="divide the device count"):
        mesh_lib.mesh_from_flags(data_parallel=True, fsdp=3)
    with pytest.raises(ValueError, match="does not cover"):
        mesh_lib.mesh_from_flags(fsdp=2)  # dp disabled, 2 != 8
    # per-chip batch semantics: indivisible global batch fails loudly
    with pytest.raises(ValueError, match="per-chip"):
        mesh_lib.shard_batch({"latents": jnp.zeros((3, 2))}, m)


def test_full_trainer_on_mesh_matches_single_device(tmp_path):
    """train_dreambooth itself (not just the step) runs under a
    dp=2,fsdp=2,tp=2 mesh and matches the single-device run step-for-step
    at equal global batch (VERDICT r1 next-round #3)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import dataclasses

    from PIL import Image

    from lora_tpu.pipelines.sd import StableDiffusionPipeline
    from lora_tpu.training.dreambooth import DreamBoothConfig, train_dreambooth

    d = tmp_path / "imgs"
    d.mkdir()
    rs = np.random.RandomState(0)
    for i in range(2):
        Image.fromarray((rs.rand(64, 64, 3) * 255).astype(np.uint8)).save(
            d / f"img{i}.jpg")

    pipe = StableDiffusionPipeline.random_init(
        jax.random.PRNGKey(0), unet_cfg=TINY_UNET, text_cfg=TINY_TEXT,
        vae_cfg=TINY_VAE)

    def run(**mesh_flags):
        cfg = DreamBoothConfig(
            instance_data_dir=str(d),
            output_dir=str(tmp_path / ("out" + str(len(mesh_flags)))),
            instance_prompt="a photo of sks dog", resolution=64,
            lora_rank=2, max_train_steps=2, save_steps=0,
            cached_latents=True, seed=0, **mesh_flags)
        return train_dreambooth(dataclasses.replace(pipe), cfg)

    # global batch 2 both ways: bs=2 single-device vs bs=1 x dp=2
    ref = run(train_batch_size=2)
    res = run(train_batch_size=1, data_parallel=True, fsdp=2,
              tensor_parallel=2)
    assert np.isfinite(res["final_loss"])
    np.testing.assert_allclose(res["final_loss"], ref["final_loss"],
                               rtol=2e-4, atol=1e-6)


def test_multislice_mesh_degenerate_and_dcn_step(base):
    """Single-slice make_multislice_mesh degenerates to dcn=1; a train step
    over an explicit (dcn, dp) mesh matches the flat dp mesh — validating
    the P(("dcn","dp")) batch sharding multi-slice DP uses over DCN."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import numpy as _np

    m1 = mesh_lib.make_multislice_mesh(dp=4, fsdp=2, tp=1)
    assert m1.axis_names == ("dcn", "dp", "fsdp", "tp")
    assert m1.shape["dcn"] == 1 and mesh_lib.data_parallel_size(m1) == 4

    # emulate 2 slices by building the dcn mesh directly from CPU devices
    from jax.sharding import Mesh

    arr = _np.array(jax.devices()[:8]).reshape(2, 4, 1, 1)
    m2 = Mesh(arr, ("dcn", "dp", "fsdp", "tp"))
    assert mesh_lib.data_parallel_size(m2) == 8

    trainable = make_trainable()
    opt = make_optimizer(trainable, {"lora_unet": 1e-3, "lora_text": 1e-3},
                         max_grad_norm=None)
    batch = make_batch(bsz=8, seed=17)
    rng = jax.random.PRNGKey(5)

    def run(mesh):
        step = make_train_step(unet_cfg=TINY_UNET, text_cfg=TINY_TEXT,
                               vae_cfg=TINY_VAE, sched=SCHED,
                               loss_cfg=LossConfig(), optimizer=opt,
                               mesh=mesh)
        t, _, l = step(
            mesh_lib.replicate_tree(
                jax.tree_util.tree_map(jnp.copy, trainable), mesh),
            mesh_lib.replicate_tree(opt.init(trainable), mesh),
            base, mesh_lib.shard_batch(batch, mesh), rng)
        return float(l)

    l_flat = run(mesh_lib.make_mesh(dp=8))
    l_dcn = run(m2)
    np.testing.assert_allclose(l_flat, l_dcn, rtol=1e-4)


def test_adam_8bit_tracks_adamw():
    """adamw_8bit (blockwise-int8 moments, the bitsandbytes-AdamW8bit
    counterpart) follows f32 AdamW on a quadratic to quantization
    tolerance, and its state is actually int8."""
    from lora_tpu.training.optim import ScaleByAdam8bitState, _Quant8

    key = jax.random.PRNGKey(0)
    w0 = jax.random.normal(key, (37, 5))  # non-multiple of the 256 block
    target = jnp.ones((37, 5))

    def loss(w):
        return jnp.mean((w - target) ** 2)

    def run(low_memory):
        trainable = {"lora_unet": {"w": w0}}
        opt = make_optimizer(trainable, {"lora_unet": 1e-2},
                             max_grad_norm=None, low_memory=low_memory)
        st = opt.init(trainable)
        w = trainable
        for _ in range(25):
            g = jax.grad(lambda t: loss(t["lora_unet"]["w"]))(w)
            up, st = opt.update(g, st, w)
            w = jax.tree_util.tree_map(lambda p, u: p + u, w, up)
        return w["lora_unet"]["w"], st

    w_ref, _ = run(False)
    w_q, st_q = run("int8")
    # moments are stored int8
    leaves = jax.tree_util.tree_leaves(
        st_q, is_leaf=lambda x: isinstance(x, _Quant8))
    qs = [l for l in leaves if isinstance(l, _Quant8)]
    assert qs and all(l.q.dtype == jnp.int8 for l in qs)
    # trajectory matches f32 AdamW within accumulated 8-bit drift
    # (25 steps at lr 1e-2; bitsandbytes drifts comparably)
    np.testing.assert_allclose(np.asarray(w_q), np.asarray(w_ref),
                               rtol=0.1, atol=0.06)
    # and it descends like the reference does
    assert float(loss(w_q)) < float(loss(w0))
    assert abs(float(loss(w_q)) - float(loss(w_ref))) < 0.05


def test_fused_optimizer_matches_per_leaf():
    """The raveled-vector optimizer (make_optimizer(fused=True), the default)
    must match the per-leaf optax.multi_transform structure exactly: Adam is
    elementwise, so fusing the ~200 LoRA leaves into one flat vector per
    group may only change summation order inside the global-norm clip."""
    trainable = make_trainable(with_ti=True)
    # synthetic grads with enough magnitude to engage the clip
    gs = jax.tree_util.tree_map(
        lambda p: jax.random.normal(jax.random.PRNGKey(hash(p.shape) % 997),
                                    p.shape) * 3.0, trainable)
    lrs = {"lora_unet": 1e-3, "lora_text": 5e-4, "ti": 5e-4}

    def run(fused):
        opt = make_optimizer(trainable, lrs, max_grad_norm=1.0, fused=fused)
        st = opt.init(trainable)
        w = trainable
        for i in range(3):
            g = jax.tree_util.tree_map(lambda x: x * (1.0 + 0.5 * i), gs)
            up, st = opt.update(g, st, w)
            w = jax.tree_util.tree_map(lambda p, u: p + u, w, up)
        return w

    w_f = run(True)
    w_p = run(False)
    for a, b in zip(jax.tree_util.tree_leaves(w_f),
                    jax.tree_util.tree_leaves(w_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_multiprocess_batch_slicing(monkeypatch):
    """Multihost contract: cached loaders yield THIS process's contiguous
    slice of the shared sample stream, and shard_batch validates global
    rows as local x process_count (single-process paths unchanged)."""
    import numpy as np

    from lora_tpu.parallel import mesh as mesh_lib
    from lora_tpu.training.pti import cached_loader

    items = [{"latents": np.full((2, 2), i, np.float32)} for i in range(8)]

    def stream(pi, pc, n=3):
        monkeypatch.setattr(jax, "process_index", lambda: pi)
        monkeypatch.setattr(jax, "process_count", lambda: pc)
        it = cached_loader(items, 4, seed=0)
        return [next(it)["latents"] for _ in range(n)]

    whole = stream(0, 1)
    p0 = stream(0, 2)
    p1 = stream(1, 2)
    for w, a, b in zip(whole, p0, p1):
        # the two process slices are disjoint halves of the global batch
        np.testing.assert_array_equal(np.concatenate([a, b]), w)

    # shard_batch: local rows x process_count must divide dp
    mesh = mesh_lib.make_mesh(dp=8)
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    with pytest.raises(ValueError, match="not\ndivisible|not divisible"):
        mesh_lib.shard_batch({"x": np.zeros((3, 2))}, mesh)


def test_prior_loss_layout_independent(base):
    """Uncached multihost prior preservation: each process collates a LOCAL
    [inst | class] batch, so the assembled global batch is interleaved
    [p0_inst, p0_class, p1_inst, p1_class]. The loss must follow the explicit
    is_instance mask, not a positional midpoint split."""
    from lora_tpu.training.loss import prior_preserving_reduce

    # reduction semantics, deterministic: mask-driven split is exact and
    # layout-independent; midpoint split over the interleaved layout is wrong
    pe = jnp.array([1.0, 2.0, 10.0, 20.0, 3.0, 4.0, 30.0, 40.0])
    m = jnp.array([1, 1, 0, 0, 1, 1, 0, 0], jnp.float32)  # interleaved
    got = float(prior_preserving_reduce(pe, m, 0.5))
    want = np.mean([1, 2, 3, 4]) + 0.5 * np.mean([10, 20, 30, 40])
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # permutation invariance: any row layout with a matching mask agrees
    perm = np.array([3, 6, 0, 5, 2, 7, 1, 4])
    got_p = float(prior_preserving_reduce(pe[perm], m[perm], 0.5))
    np.testing.assert_allclose(got_p, want, rtol=1e-6)
    # the midpoint fallback on this interleaved layout would be wrong
    bad = float(prior_preserving_reduce(pe, None, 0.5))
    assert abs(bad - want) > 1.0

    # end-to-end: loss_step with a contiguous mask equals the midpoint path
    # on the same batch/rng (same slot order -> same noise pairing)
    rng = jax.random.PRNGKey(3)
    b = make_batch(bsz=4)
    with_mask = dict(b)
    with_mask["is_instance"] = jnp.array([1, 1, 0, 0], jnp.float32)
    kw = loss_kwargs(base, cfg=LossConfig(with_prior_preservation=True,
                                          prior_loss_weight=0.7))
    trainable = make_trainable()
    l_mask = loss_step(trainable, with_mask, rng, **kw)
    l_mid = loss_step(trainable, b, rng, **kw)
    np.testing.assert_allclose(float(l_mask), float(l_mid), rtol=1e-5)


def test_prior_loaders_emit_is_instance(tmp_path):
    """Both DreamBooth loaders carry the row-layout mask: the uncached
    collate flags its local [inst | class] halves, and rows flagged 0 are
    exactly the class rows (alignment, not just counts)."""
    from PIL import Image

    from lora_tpu.data.dataset import DreamBoothDataset, data_loader

    inst_dir = tmp_path / "inst"
    cls_dir = tmp_path / "cls"
    inst_dir.mkdir()
    cls_dir.mkdir()
    for i in range(3):
        Image.new("RGB", (32, 32), (255, 0, 0)).save(inst_dir / f"{i}.jpg")
        Image.new("RGB", (32, 32), (0, 0, 255)).save(cls_dir / f"{i}.jpg")

    class Tok:
        model_max_length = 77

        def __call__(self, texts, **kw):
            return {"input_ids": [[49406, 320, 49407] for _ in texts]}

    ds = DreamBoothDataset(
        instance_data_root=str(inst_dir), instance_prompt="a sks thing",
        tokenizer=Tok(), class_data_root=str(cls_dir),
        class_prompt="a thing", size=32, center_crop=True)
    batch = next(data_loader(ds, 2, prior_preservation=True, seed=0,
                             shuffle=False))
    np.testing.assert_array_equal(batch["is_instance"], [1, 1, 0, 0])
    # instance images are red, class images blue — check channel alignment
    px = batch["pixel_values"]  # normalized to [-1, 1]
    red = px[..., 0].mean(axis=(1, 2)) > px[..., 2].mean(axis=(1, 2))
    np.testing.assert_array_equal(red, batch["is_instance"].astype(bool))
