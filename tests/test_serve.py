"""HTTP serving endpoint on the tiny pipeline."""

import base64
import json
import time
import urllib.error
import urllib.request

import jax
import pytest

from lora_tpu.models.config import TINY_TEXT, TINY_UNET, TINY_VAE
from lora_tpu.pipelines.sd import StableDiffusionPipeline
from lora_tpu.serve import PipelineServer


@pytest.fixture(scope="module")
def server():
    pipe = StableDiffusionPipeline.random_init(
        jax.random.PRNGKey(0), unet_cfg=TINY_UNET, text_cfg=TINY_TEXT,
        vae_cfg=TINY_VAE)
    srv = PipelineServer(pipe, port=0).start()
    yield srv
    srv.stop()


def _post(srv, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}/generate",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=300) as r:
        return json.loads(r.read()), r.status


def test_healthz(server):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{server.port}/healthz", timeout=30) as r:
        body = json.loads(r.read())
    assert body["ok"] is True and body["devices"]


def test_generate(server):
    out, status = _post(server, {"prompt": "a tiny tree", "steps": 2,
                                 "height": 64, "width": 64, "seed": 1})
    assert status == 200
    assert len(out["images"]) == 1 and out["latency_ms"] > 0
    png = base64.b64decode(out["images"][0])
    assert png[:8] == b"\x89PNG\r\n\x1a\n"


def test_generate_batch_and_errors(server):
    out, status = _post(server, {"prompt": ["a", "b"], "steps": 2,
                                 "height": 64, "width": 64})
    assert status == 200 and len(out["images"]) == 2

    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/generate",
        data=json.dumps({"steps": "NaN?"}).encode())
    try:
        urllib.request.urlopen(req, timeout=60)
        raised = False
    except urllib.error.HTTPError as e:
        raised = e.code == 400
    assert raised

    try:
        urllib.request.urlopen(
            f"http://127.0.0.1:{server.port}/nope", timeout=30)
        missing = False
    except urllib.error.HTTPError as e:
        missing = e.code == 404
    assert missing


def test_micro_batching_coalesces_concurrent_requests(server):
    """Concurrent same-config requests are served in ONE device batch, each
    keeping its own seed; a config mismatch is never merged."""
    import threading

    results = {}

    def fire(name, seed, steps=2):
        out, status = _post(server, {"prompt": "a tiny tree", "steps": steps,
                                     "height": 64, "width": 64, "seed": seed})
        results[name] = (out, status)

    # occupy the worker so the followers queue up together
    lead = threading.Thread(target=fire, args=("lead", 0))
    lead.start()
    import time as _time

    _time.sleep(0.3)
    followers = [threading.Thread(target=fire, args=(f"f{i}", i + 1))
                 for i in range(3)]
    for t in followers:
        t.start()
    for t in [lead] + followers:
        t.join()

    assert all(status == 200 for _, status in results.values())
    sizes = {k: out["batched_with"] for k, (out, _) in results.items()}
    assert max(sizes.values()) >= 2, sizes  # followers coalesced
    # different seeds -> different images inside the same batch
    import base64 as b64

    f_imgs = {k: results[k][0]["images"][0] for k in ("f0", "f1")}
    assert f_imgs["f0"] != f_imgs["f1"]


def test_embed_cache_hits_and_determinism(server):
    """Repeated prompts are served from the embedding cache (no second
    CLIP forward) and produce identical images."""
    payload = {"prompt": "a cached prompt", "steps": 2,
               "height": 64, "width": 64, "seed": 7}
    out1, _ = _post(server, payload)
    h0 = server.embed_cache_hits
    out2, _ = _post(server, payload)
    # second request: prompt AND negative prompt both hit the cache
    assert server.embed_cache_hits >= h0 + 2
    assert out1["images"] == out2["images"]


def test_embed_cache_tracks_effective_alpha(server):
    """With a text-encoder LoRA patched, a request that omits alpha runs at
    the pipe's current scale; the cache must key on that EFFECTIVE scale —
    a no-alpha request after an alpha change must not reuse embeddings
    encoded at the old scale (regression: stale conditioning)."""
    import numpy as np

    from lora_tpu.core.lora import init_lora

    pipe = server.pipe
    had_text = pipe.lora_text
    pipe.lora_text = init_lora(pipe.text_sites(), r=2,
                               rng=jax.random.PRNGKey(5))
    # make the text LoRA actually change the embeddings (ups init to zero)
    for e in pipe.lora_text["sites"].values():
        e["up"] = e["up"] + 0.05
    try:
        base = {"prompt": "alpha probe", "steps": 2, "height": 64,
                "width": 64, "seed": 11}
        out_a, _ = _post(server, {**base, "alpha": 0.0})
        out_none, _ = _post(server, base)       # runs at effective 0.0
        out_b, _ = _post(server, {**base, "alpha": 1.0})
        out_none2, _ = _post(server, base)      # now effective 1.0
        assert out_none["images"] == out_a["images"]
        assert out_none2["images"] == out_b["images"]
        assert out_a["images"] != out_b["images"]
    finally:
        pipe.lora_text = had_text
        pipe.tune_lora_scale(1.0)
        server._current_alpha = 1.0


def test_embed_cache_invalidated_on_adapter_swap(server, tmp_path):
    """patch_pipe on a live server at the SAME alpha must not serve the old
    adapter's cached embeddings (regression: the LRU was keyed only by
    (text, alpha) and went stale across adapter swaps)."""
    import jax.numpy as jnp
    import numpy as np

    from lora_tpu.core.lora import init_lora, lora_to_pairs
    from lora_tpu.formats.safetensors_io import (
        TEXT_ENCODER_DEFAULT_TARGET_REPLACE,
        save_safeloras_with_embeds,
    )

    pipe = server.pipe
    had_text, had_unet = pipe.lora_text, pipe.lora_unet

    def make_file(seed, bump):
        sites = pipe.text_sites()
        lt = init_lora(sites, r=2, rng=jax.random.PRNGKey(seed))
        for e in lt["sites"].values():
            e["up"] = e["up"] + bump
        p = str(tmp_path / f"adapter{seed}.safetensors")
        save_safeloras_with_embeds(
            {"text_encoder": (lora_to_pairs(lt, sites),
                              TEXT_ENCODER_DEFAULT_TARGET_REPLACE)}, {}, p)
        return p

    base = {"prompt": "swap probe", "steps": 2, "height": 64, "width": 64,
            "seed": 3, "alpha": 1.0}
    try:
        pipe.patch_pipe(make_file(21, 0.05), patch_unet=False)
        out1, _ = _post(server, base)
        pipe.patch_pipe(make_file(22, -0.05), patch_unet=False)
        out2, _ = _post(server, base)  # same text, same alpha, new adapter
        assert out1["images"] != out2["images"]
    finally:
        pipe.lora_text, pipe.lora_unet = had_text, had_unet
        pipe.adapter_generation += 1
        server._current_alpha = 1.0


def test_mixed_config_concurrency(server):
    """Concurrent requests with DIFFERENT configs are never merged into one
    device batch, but all complete correctly under contention (the spill
    path seeds the next batch)."""
    import threading

    results = {}

    def fire(name, payload):
        results[name] = _post(server, payload)

    threads = []
    for i in range(6):
        steps = 2 if i % 2 == 0 else 3  # two configs interleaved
        payload = {"prompt": f"mixed {i % 2}", "steps": steps,
                   "height": 64, "width": 64, "seed": i}
        threads.append(threading.Thread(target=fire, args=(f"r{i}", payload)))
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    assert all(status == 200 for _, status in results.values())
    # a request never shares a batch with the other config: every member of
    # a coalesced group ran the same steps value, so image counts match the
    # per-request prompt counts (smoke) and nothing deadlocked
    assert all(len(out["images"]) == 1 for out, _ in results.values())


def test_deadline_cuts_coalescing_window(server):
    """A request carrying deadline_ms must not sit out a long coalescing
    window: the batch is cut once budget - estimated-exec is spent. With a
    3 s window, a lone deadline_ms=100 request returns far sooner."""
    from lora_tpu.serve import PipelineServer

    srv = PipelineServer(server.pipe, port=0, batch_window_ms=3000.0).start()
    try:
        # warm the exec-time EWMA + jit cache for this config
        _post(srv, {"prompt": "warm", "steps": 2, "height": 64, "width": 64,
                    "deadline_ms": 100})
        t0 = time.perf_counter()
        out, status = _post(srv, {"prompt": "deadline probe", "steps": 2,
                                  "height": 64, "width": 64,
                                  "deadline_ms": 100})
        wall = time.perf_counter() - t0
        assert status == 200 and out["batched_with"] == 1
        # would be >= 3 s if the fixed window were honored
        assert wall < 2.5, f"deadline did not cut the window ({wall:.2f}s)"
    finally:
        srv.stop()


def test_queue_bound_sheds_with_503(server):
    """Requests beyond max_queue are shed with HTTP 503 (backpressure), not
    queued into certain deadline misses."""
    from lora_tpu.serve import PipelineServer

    srv = PipelineServer(server.pipe, port=0, max_queue=0).start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/generate",
            data=json.dumps({"prompt": "shed me", "steps": 2,
                             "height": 64, "width": 64}).encode())
        try:
            urllib.request.urlopen(req, timeout=60)
            status = 200
        except urllib.error.HTTPError as e:
            status = e.code
            body = json.loads(e.read())
        assert status == 503
        assert "max_queue" in body["error"]
        assert srv.shed_count == 1
    finally:
        srv.stop()


def test_batch_bucketing_pads_device_batch(server):
    """Coalesced groups are padded to the next power-of-two bucket so only
    len(batch_buckets) XLA programs ever compile — an odd group size must
    run as the next bucket while each request still gets its own image."""
    import threading

    from lora_tpu.serve import PipelineServer

    srv = PipelineServer(server.pipe, port=0, batch_window_ms=1500.0).start()
    try:
        results = {}

        def fire(name, seed):
            results[name] = _post(srv, {"prompt": "bucket probe",
                                        "steps": 2, "height": 64,
                                        "width": 64, "seed": seed})

        # exactly 3 concurrent requests land inside the 1.5 s window ->
        # one group of 3 -> padded to the 4-bucket
        followers = [threading.Thread(target=fire, args=(f"f{i}", i + 1))
                     for i in range(3)]
        for t in followers:
            t.start()
        for t in followers:
            t.join()

        assert all(s == 200 for _, s in results.values())
        sizes = {k: out["batched_with"] for k, (out, _) in results.items()}
        assert max(sizes.values()) == 3, sizes
        assert srv.last_device_batch == 4  # padded to the bucket
        # distinct seeds -> distinct images even with pad rows present
        f_imgs = {k: results[k][0]["images"][0] for k in ("f0", "f1", "f2")}
        assert len(set(f_imgs.values())) == 3
    finally:
        srv.stop()


def test_warmup_compiles_all_buckets(server):
    """Deploy-time warmup runs one group per bucket size so no live request
    pays an XLA compile; subsequent single requests reuse the compiled
    shapes."""
    from lora_tpu.serve import PipelineServer

    srv = PipelineServer(server.pipe, port=0, max_batch=4).start()
    try:
        secs = srv.warmup(steps=2, height=64, width=64)
        assert secs > 0 and srv.batch_buckets == (1, 2, 4)
        assert srv.last_device_batch == 4  # largest bucket ran last
        out, status = _post(srv, {"prompt": "after warmup", "steps": 2,
                                  "height": 64, "width": 64})
        assert status == 200 and len(out["images"]) == 1
    finally:
        srv.stop()


def test_prompt_list_rows_count_toward_bucket_cap(server):
    """Coalescing caps by prompt ROW count, not request count: two 3-prompt
    requests in one window must run as one 6-row group padded to the
    8-bucket — never an unwarmed >max_batch shape."""
    import threading

    from lora_tpu.serve import PipelineServer

    srv = PipelineServer(server.pipe, port=0, batch_window_ms=1500.0,
                         max_batch=8).start()
    try:
        results = {}

        def fire(name, seed):
            results[name] = _post(srv, {
                "prompt": [f"row {seed} {j}" for j in range(3)],
                "steps": 2, "height": 64, "width": 64, "seed": seed})

        ts = [threading.Thread(target=fire, args=(f"r{i}", i))
              for i in range(2)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert all(s == 200 for _, s in results.values())
        assert all(len(out["images"]) == 3 for out, _ in results.values())
        # 6 real rows -> 8-bucket, within the warmed set
        assert srv.last_device_batch == 8
    finally:
        srv.stop()


def test_oversize_prompt_list_rejected(server):
    """A single request wider than max_batch can never fit a warmed bucket
    — reject it up front (400) instead of compiling a fresh shape."""
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(server, {"prompt": [f"p{i}" for i in range(9)], "steps": 2,
                       "height": 64, "width": 64})
    assert ei.value.code == 400
    assert b"max_batch" in ei.value.read()


def test_largest_bucket_must_equal_max_batch(server):
    """The bucket set must cover max_batch exactly, or coalesced groups
    between the largest bucket and max_batch would hit uncompiled shapes;
    non-power-of-two max_batch gets its own top bucket."""
    from lora_tpu.serve import PipelineServer

    with pytest.raises(ValueError, match="max_batch"):
        PipelineServer(server.pipe, port=0, max_batch=8,
                       batch_buckets=(1, 2, 4))
    srv = PipelineServer(server.pipe, port=0, max_batch=12)
    assert srv.batch_buckets == (1, 2, 4, 8, 12)
    srv.stop()


def test_metrics_endpoint(server):
    """GET /metrics returns the counters a dashboard needs, consistent
    with the requests this module has already served."""
    out, status = _post(server, {"prompt": "metrics probe", "steps": 2,
                                 "height": 64, "width": 64, "seed": 3})
    assert status == 200
    with urllib.request.urlopen(
            f"http://127.0.0.1:{server.port}/metrics", timeout=30) as r:
        m = json.loads(r.read())
    assert m["requests"] >= 1 and m["images"] >= 1
    assert m["inflight"] == 0 and m["draining"] is False
    assert m["uptime_s"] > 0
    assert m["exec_ewma_s"] is None or m["exec_ewma_s"] > 0
    assert m["embed_cache_hits"] + m["embed_cache_misses"] > 0


def test_drain_finishes_admitted_sheds_new(server):
    """Graceful shutdown: drain() lets already-admitted requests finish
    (success, not error) while anything arriving after the drain flag is
    shed with 503 — the balancer's cue to retry elsewhere."""
    import threading

    from lora_tpu.serve import PipelineServer

    srv = PipelineServer(server.pipe, port=0).start()
    try:
        results = {}

        def fire(name, seed):
            try:
                results[name] = _post(srv, {"prompt": "drain probe",
                                            "steps": 2, "height": 64,
                                            "width": 64, "seed": seed})
            except urllib.error.HTTPError as e:
                results[name] = (None, e.code)

        t = threading.Thread(target=fire, args=("admitted", 1))
        t.start()
        # wait until the request is actually admitted (or, on a fast tiny
        # pipe, already served — either way drain() must not error it)
        deadline = time.monotonic() + 30
        while srv.metrics()["inflight"] == 0 and "admitted" not in results:
            assert time.monotonic() < deadline, "request never admitted"
            time.sleep(0.01)
        assert srv.drain(timeout=120) is True
        t.join()
        out, status = results["admitted"]
        assert status == 200 and len(out["images"]) == 1

        # post-drain arrival: shed with 503, never queued
        fire("late", 2)
        assert results["late"] == (None, 503)
        m = srv.metrics()
        assert m["draining"] is True and m["inflight"] == 0
        # healthz advertises the drain so balancers stop routing here
        with urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/healthz", timeout=30) as r:
            assert json.loads(r.read())["draining"] is True
    finally:
        srv.stop()


def test_empty_prompt_list_rejected(server):
    """[] passes n_rows>max_batch but would crash the whole coalesced group
    in _run_group's bucket padding; it must 400 at admission."""
    for bad in ([], 7):
        req = urllib.request.Request(
            f"http://127.0.0.1:{server.port}/generate",
            data=json.dumps({"prompt": bad, "steps": 2,
                             "height": 64, "width": 64}).encode())
        try:
            urllib.request.urlopen(req, timeout=60)
            code = 200
        except urllib.error.HTTPError as e:
            code = e.code
        assert code == 400


def test_backpressure_counts_rows_not_requests(server):
    """max_queue is a ROW budget: one queued 3-row request must trip the
    shed threshold that three queued 1-row requests would."""
    import threading

    from lora_tpu.serve import ServerOverloaded

    srv = PipelineServer(server.pipe, port=0, max_queue=2)
    results = {}

    def submit(name, req):
        try:
            results[name] = srv.generate(req)
        except Exception as e:
            results[name] = e

    # park the worker: it collects request A, then blocks on the pipe lock
    # inside _run_group while we examine the queue behind it
    with srv.lock:
        ta = threading.Thread(target=submit, args=(
            "a", {"prompt": "a", "steps": 2, "height": 64, "width": 64}),
            daemon=True)
        ta.start()
        for _ in range(500):  # until the worker has pulled A off the queue
            if srv._queued_rows == 0 and srv._inflight == 1:
                break
            time.sleep(0.01)
        # B: 3 rows, different config key so it can never join A's batch
        tb = threading.Thread(target=submit, args=(
            "b", {"prompt": ["b1", "b2", "b3"], "steps": 3,
                  "height": 64, "width": 64}), daemon=True)
        tb.start()
        for _ in range(500):
            if srv._queued_rows == 3:
                break
            time.sleep(0.01)
        assert srv._queued_rows == 3
        # 3 queued rows >= max_queue 2 -> shed, though only ONE request
        # (plus the in-flight one) is ahead of us
        with pytest.raises(ServerOverloaded, match="queued rows"):
            srv.generate({"prompt": "d", "steps": 2,
                          "height": 64, "width": 64})
        assert srv.shed_count == 1
        assert srv.metrics()["queued_rows"] == 3
    ta.join(timeout=300)
    tb.join(timeout=300)
    assert len(results["a"]["images"]) == 1
    assert len(results["b"]["images"]) == 3
    assert srv._queued_rows == 0
    srv.httpd.server_close()


def test_xl_pipeline_serving(tmp_path):
    """An SDXL pipe serves through the same endpoint: the embed cache
    stores (context, pooled) pairs, CFG negatives flow through, and
    repeats hit the cache. (Alpha keying with a patched te2 LoRA is
    covered by test_xl_te2_lora_keys_embed_cache.)"""
    from lora_tpu.models.config import (
        TINY_XL_TEXT,
        TINY_XL_TEXT2,
        TINY_XL_UNET,
    )
    from lora_tpu.pipelines.sdxl import StableDiffusionXLPipeline

    pipe = StableDiffusionXLPipeline.random_init(
        jax.random.PRNGKey(0), unet_cfg=TINY_XL_UNET, text_cfg=TINY_XL_TEXT,
        text2_cfg=TINY_XL_TEXT2, vae_cfg=TINY_VAE)
    srv = PipelineServer(pipe, port=0).start()
    try:
        out, status = _post(srv, {"prompt": "a tiny xl tree", "steps": 2,
                                  "height": 64, "width": 64, "seed": 1,
                                  "guidance": 5.0})
        assert status == 200 and len(out["images"]) == 1
        png = base64.b64decode(out["images"][0])
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        misses0 = srv.embed_cache_misses
        # identical request: deterministic AND embed-cache served
        out2, _ = _post(srv, {"prompt": "a tiny xl tree", "steps": 2,
                              "height": 64, "width": 64, "seed": 1,
                              "guidance": 5.0})
        assert out2["images"][0] == out["images"][0]
        assert srv.embed_cache_misses == misses0
        assert srv.embed_cache_hits > 0
    finally:
        srv.stop()


def test_xl_te2_lora_keys_embed_cache(tmp_path):
    """A te2-ONLY XL adapter (lora_text stays None, lora_text2 set) must
    flip has_text_lora, so the embed cache keys on the effective alpha:
    repeats at one alpha hit, an alpha change misses and re-encodes, and
    alpha=0 reproduces the unpatched render exactly."""
    import jax.numpy as jnp
    import numpy as np

    from lora_tpu.core.lora import init_lora
    from lora_tpu.core.sites import text_encoder_lora_sites
    from lora_tpu.models.config import (
        TINY_XL_TEXT,
        TINY_XL_TEXT2,
        TINY_XL_UNET,
    )
    from lora_tpu.formats.kohya import save_kohya_xl
    from lora_tpu.pipelines.sdxl import StableDiffusionXLPipeline

    pipe = StableDiffusionXLPipeline.random_init(
        jax.random.PRNGKey(0), unet_cfg=TINY_XL_UNET, text_cfg=TINY_XL_TEXT,
        text2_cfg=TINY_XL_TEXT2, vae_cfg=TINY_VAE)
    t2 = text_encoder_lora_sites(TINY_XL_TEXT2)
    lt2 = init_lora(t2, r=2, rng=jax.random.PRNGKey(5))
    for e in lt2["sites"].values():
        e["up"] = e["up"] + jnp.float32(0.1)
    p = str(tmp_path / "te2only.safetensors")
    save_kohya_xl(p, unet_cfg=TINY_XL_UNET, lora_text2=lt2, text2_sites=t2,
                  dtype=np.float32)

    srv = PipelineServer(pipe, port=0).start()
    req = {"prompt": "an xl probe", "steps": 2, "height": 64, "width": 64,
           "seed": 2, "alpha": 1.0}
    try:
        base_out, _ = _post(srv, req)  # unpatched render at this seed
        with srv.lock:
            pipe.patch_pipe(p)
        assert pipe.lora_text is None and pipe.lora_text2 is not None
        assert pipe.lora_unet is None

        out1, _ = _post(srv, req)
        assert out1["images"] != base_out["images"]  # te2 LoRA is live
        m0 = srv.embed_cache_misses
        out1b, _ = _post(srv, req)  # same text, same alpha: pure cache hit
        assert srv.embed_cache_misses == m0
        assert out1b["images"] == out1["images"]

        out0, _ = _post(srv, dict(req, alpha=0.0))  # alpha change: re-encode
        assert srv.embed_cache_misses > m0
        # zero scale == unpatched forward, bit-for-bit at the same seed
        assert out0["images"] == base_out["images"]
    finally:
        srv.stop()


# -- image modes: img2img / inpaint ------------------------------------------

def _png_payload(arr_uint8):
    import io as _io

    import numpy as np
    from PIL import Image

    buf = _io.BytesIO()
    Image.fromarray(np.asarray(arr_uint8, np.uint8)).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def _rand_image_png(seed=11, h=64, w=64):
    import numpy as np

    rs = np.random.RandomState(seed)
    return _png_payload(rs.randint(0, 256, (h, w, 3), dtype=np.uint8))


def _mask_png(h=64, w=64, repaint_right=True):
    import numpy as np

    m = np.zeros((h, w), np.uint8)
    if repaint_right:
        m[:, w // 2:] = 255
    return _png_payload(m)


def test_img2img_serving(server):
    img = _rand_image_png()
    payload = {"mode": "img2img", "prompt": "a tiny tree", "image": img,
               "steps": 2, "strength": 1.0, "seed": 3}
    out, status = _post(server, payload)
    assert status == 200 and len(out["images"]) == 1
    png = base64.b64decode(out["images"][0])
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    # a single-request group is fully seed-deterministic
    out2, _ = _post(server, payload)
    assert out["images"] == out2["images"]


def test_inpaint_serving_keep_all_matches_roundtrip(server):
    """An all-keep mask (latent-blend path on a plain 4-channel pipe)
    returns decode(encode(image)) exactly, up to PNG 8-bit truncation."""
    import io as _io

    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from lora_tpu.pipelines.sd import _jit_vae_encode

    rs = np.random.RandomState(5)
    arr = rs.randint(0, 256, (64, 64, 3), dtype=np.uint8)
    payload = {"mode": "inpaint", "prompt": "x", "image": _png_payload(arr),
               "mask": _png_payload(np.zeros((64, 64), np.uint8)),
               "steps": 2, "guidance": 1.0, "seed": 9}
    out, status = _post(server, payload)
    assert status == 200
    got = np.asarray(Image.open(_io.BytesIO(base64.b64decode(
        out["images"][0]))), np.float32) / 255.0
    # expected: the VAE roundtrip under the server's rng derivation
    # (group rng = PRNGKey(seed); inpaint_blend splits k_enc first)
    image = jnp.asarray(arr.astype(np.float32) / 127.5 - 1.0)[None]
    k_enc, _ = jax.random.split(jax.random.PRNGKey(9))
    z0 = _jit_vae_encode(server.pipe.vae_params,
                         image.astype(server.pipe.dtype),
                         server.pipe.vae_cfg, k_enc)
    expect = server.pipe._decode(z0)[0]
    assert np.abs(got - expect).max() <= 1.0 / 255.0 + 1e-6


def test_image_mode_coalescing(server):
    """Concurrent same-config img2img requests coalesce into one device
    batch; txt2img can never merge with an image mode (key() carries the
    mode)."""
    import threading

    from lora_tpu.serve import _Pending

    img = _rand_image_png()
    results = {}

    def fire(name, seed):
        out, status = _post(server, {"mode": "img2img", "prompt": "t",
                                     "image": img, "steps": 2,
                                     "strength": 1.0, "seed": seed})
        results[name] = (out, status)

    lead = threading.Thread(target=fire, args=("lead", 0))
    lead.start()
    time.sleep(0.3)
    followers = [threading.Thread(target=fire, args=(f"f{i}", i + 1))
                 for i in range(2)]
    for t in followers:
        t.start()
    for t in [lead] + followers:
        t.join()
    assert all(s == 200 for _, s in results.values())
    assert max(out["batched_with"] for out, _ in results.values()) >= 2
    # different seeds inside one batch -> different images
    assert (results["f0"][0]["images"][0]
            != results["f1"][0]["images"][0])
    assert (_Pending({"prompt": "t"}).key()
            != _Pending({"mode": "img2img", "prompt": "t",
                         "image": img}).key())


def _expect_400(server, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/generate",
        data=json.dumps(payload).encode())
    try:
        urllib.request.urlopen(req, timeout=60)
        return False
    except urllib.error.HTTPError as e:
        return e.code == 400


def test_image_mode_rejections(server):
    img = _rand_image_png()
    assert _expect_400(server, {"mode": "paint-by-numbers", "prompt": "x"})
    assert _expect_400(server, {"mode": "img2img", "prompt": "x"})  # no image
    assert _expect_400(server, {"mode": "inpaint", "prompt": "x",
                                "image": img})  # no mask
    assert _expect_400(server, {"mode": "inpaint", "prompt": "x",
                                "image": img,
                                "mask": _mask_png(32, 32)})  # size mismatch
    assert _expect_400(server, {"mode": "img2img", "prompt": "x",
                                "image": img,
                                "scheduler": "euler"})  # ddim-only
    assert _expect_400(server, {"mode": "inpaint", "prompt": "x",
                                "image": img, "mask": _mask_png(),
                                "scheduler": "pndm"})  # blend rejects pndm
    assert _expect_400(server, {"mode": "img2img", "prompt": "x",
                                "image": _rand_image_png(h=40, w=40)})
    # image list length must match prompt rows
    assert _expect_400(server, {"mode": "img2img", "prompt": ["a", "b"],
                                "image": [img]})


def test_xl_inpaint_serving_routes_blend():
    from lora_tpu.models.config import (
        TINY_XL_TEXT,
        TINY_XL_TEXT2,
        TINY_XL_UNET,
    )
    from lora_tpu.pipelines.sdxl import StableDiffusionXLPipeline

    pipe = StableDiffusionXLPipeline.random_init(
        jax.random.PRNGKey(0), unet_cfg=TINY_XL_UNET, text_cfg=TINY_XL_TEXT,
        text2_cfg=TINY_XL_TEXT2, vae_cfg=TINY_VAE)
    srv = PipelineServer(pipe, port=0)
    try:
        out = srv.generate({"mode": "inpaint", "prompt": "a dog",
                            "image": _rand_image_png(),
                            "mask": _mask_png(), "steps": 2,
                            "guidance": 5.0, "seed": 1})
        assert len(out["images"]) == 1
        png = base64.b64decode(out["images"][0])
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
    finally:
        srv.stop()


def test_nine_channel_inpaint_serving_routes_unet_path():
    import dataclasses

    import numpy as np

    inpaint_cfg = dataclasses.replace(TINY_UNET, in_channels=9)
    pipe = StableDiffusionPipeline.random_init(
        jax.random.PRNGKey(0), unet_cfg=inpaint_cfg, text_cfg=TINY_TEXT,
        vae_cfg=TINY_VAE)
    srv = PipelineServer(pipe, port=0)
    try:
        out = srv.generate({"mode": "inpaint", "prompt": "a dog",
                            "image": _rand_image_png(),
                            "mask": _mask_png(), "steps": 2, "seed": 1})
        assert len(out["images"]) == 1
        # the 9-channel path takes no lora_idx — rejected at admit
        try:
            srv.generate({"mode": "inpaint", "prompt": "x",
                          "image": _rand_image_png(), "mask": _mask_png(),
                          "steps": 2, "lora_idx": [0]})
            rejected = False
        except ValueError:
            rejected = True
        assert rejected
    finally:
        srv.stop()


def test_image_mode_uses_embed_cache(server):
    """Image modes share the txt2img embed cache: a repeated img2img
    request serves its prompt AND negative embedding from the cache."""
    img = _rand_image_png(seed=21)
    payload = {"mode": "img2img", "prompt": "a cached img2img prompt",
               "image": img, "steps": 2, "strength": 1.0, "seed": 4}
    out1, _ = _post(server, payload)
    h0 = server.embed_cache_hits
    out2, _ = _post(server, payload)
    assert server.embed_cache_hits >= h0 + 2
    assert out1["images"] == out2["images"]


def test_warmup_covers_image_modes(server):
    """warmup(modes=(...,)) compiles the image-mode programs per bucket so
    the first live img2img/inpaint request reuses a warmed shape."""
    from lora_tpu.serve import PipelineServer

    srv = PipelineServer(server.pipe, port=0, max_batch=2).start()
    try:
        secs = srv.warmup(steps=2, height=64, width=64,
                          modes=("img2img", "inpaint"), strength=1.0)
        assert secs > 0 and srv.last_device_batch == 2
        out, status = _post(srv, {"mode": "img2img", "prompt": "live",
                                  "image": _rand_image_png(), "steps": 2,
                                  "strength": 1.0, "seed": 3})
        assert status == 200 and len(out["images"]) == 1
    finally:
        srv.stop()


def test_malformed_numeric_field_rejected_at_admit(server):
    """int()/float()-coercible fields are validated in the REQUESTER's
    thread (400) — under lazy key() a {"steps": "abc"} request admitted to
    the queue would crash the scheduler thread at coalescing time and hang
    every later request behind a green healthz."""
    for bad in ({"prompt": "x", "steps": "abc"},
                {"prompt": "x", "guidance": "hot"},
                {"prompt": "x", "height": "tall"}):
        req = urllib.request.Request(
            f"http://127.0.0.1:{server.port}/generate",
            data=json.dumps({**bad, "steps": bad.get("steps", 2)}).encode())
        try:
            urllib.request.urlopen(req, timeout=60)
            code = 200
        except urllib.error.HTTPError as e:
            code = e.code
        assert code == 400, bad
    # the scheduler survived admit-side rejection: work still flows
    out, status = _post(server, {"prompt": "still alive", "steps": 2,
                                 "height": 64, "width": 64, "seed": 9})
    assert status == 200 and len(out["images"]) == 1
    assert server.metrics()["scheduler_alive"] is True


def test_scheduler_crash_fails_loudly_not_hangs(server):
    """If the scheduler thread dies, waiters get SchedulerDown (not an
    eternal hang), queued requests are failed, new admits are refused, and
    healthz flips unhealthy — the crash is loud at every surface."""
    import threading

    from lora_tpu.serve import PipelineServer, SchedulerDown

    srv = PipelineServer(server.pipe, port=0).start()
    try:
        release = threading.Event()

        def boom():
            release.wait(60)
            raise RuntimeError("collector exploded")

        srv._collect = boom
        # the worker is blocked inside the ORIGINAL _collect; one request
        # flows through it, after which the next loop iteration hits boom()
        out = srv.generate({"prompt": "last good", "steps": 2,
                            "height": 64, "width": 64, "seed": 1})
        assert len(out["images"]) == 1

        errs = {}

        def waiter():
            try:
                srv.generate({"prompt": "stranded", "steps": 2,
                              "height": 64, "width": 64})
            except Exception as e:
                errs["stranded"] = e

        t = threading.Thread(target=waiter)
        t.start()
        deadline = time.monotonic() + 30
        while srv._queue.qsize() == 0 and time.monotonic() < deadline:
            time.sleep(0.01)
        assert srv._queue.qsize() == 1  # queued, waiting on the scheduler
        release.set()
        t.join(timeout=30)
        assert not t.is_alive(), "stranded waiter HUNG after scheduler death"
        assert isinstance(errs["stranded"], SchedulerDown)
        # new admits are refused with the same loud error
        with pytest.raises(SchedulerDown):
            srv.generate({"prompt": "after crash", "steps": 2})
        assert srv.metrics()["scheduler_alive"] is False
        # healthz reports unhealthy with HTTP 500
        try:
            urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/healthz", timeout=30)
            code, body = 200, {}
        except urllib.error.HTTPError as e:
            code, body = e.code, json.loads(e.read())
        assert code == 500 and body["ok"] is False
        assert "collector exploded" in body["fatal"]
    finally:
        srv.stop()


def test_lora_idx_and_seed_validated_at_admit(server):
    """lora_idx length/type and seed are coerced in the REQUESTER's thread:
    a mis-sized lora_idx list would silently misalign per-row adapter
    routing for every later member of the coalesced batch, and a malformed
    seed deferred to the scheduler would 400 innocent coalesced members."""
    for bad in ({"prompt": ["a", "b"], "lora_idx": [0]},      # 1 for 2 rows
                {"prompt": "x", "lora_idx": ["zero"]},        # non-int
                {"prompt": "x", "lora_idx": "zero"},          # non-int scalar
                {"prompt": "x", "seed": "abc"}):              # non-int seed
        with pytest.raises(ValueError):
            server.generate({"steps": 2, "height": 64, "width": 64, **bad})
    # rejection happened at admit: nothing queued, nothing in flight
    m = server.metrics()
    assert m["queued_rows"] == 0 and m["inflight"] == 0
    out, status = _post(server, {"prompt": "alive", "steps": 2,
                                 "height": 64, "width": 64, "seed": 5})
    assert status == 200 and len(out["images"]) == 1


def test_nine_channel_checkpoint_rejects_wrong_modes_at_admit():
    """A 9-channel inpainting checkpoint serves mode='inpaint' ONLY:
    txt2img/img2img must 400 at admit (and warmup must fail loudly at
    deploy time), never burn a device-batch slot and surface as an opaque
    XLA conv-shape error for the whole coalesced group."""
    import dataclasses

    inpaint_cfg = dataclasses.replace(TINY_UNET, in_channels=9)
    pipe = StableDiffusionPipeline.random_init(
        jax.random.PRNGKey(0), unet_cfg=inpaint_cfg, text_cfg=TINY_TEXT,
        vae_cfg=TINY_VAE)
    srv = PipelineServer(pipe, port=0)
    try:
        with pytest.raises(ValueError, match="9-channel"):
            srv.generate({"prompt": "x", "steps": 2})
        with pytest.raises(ValueError, match="9-channel"):
            srv.generate({"mode": "img2img", "prompt": "x", "steps": 2,
                          "image": _rand_image_png()})
        with pytest.raises(ValueError, match="9-channel"):
            srv.warmup(steps=2, height=64, width=64, modes=("txt2img",))
        m = srv.metrics()
        assert m["queued_rows"] == 0 and m["inflight"] == 0
    finally:
        srv.stop()


def test_image_modes_shed_before_decode(server, monkeypatch):
    """A draining/overloaded server sheds image-mode requests BEFORE paying
    their base64+PNG decode — backpressure must stay cheap under burst."""
    import lora_tpu.serve as serve_mod
    from lora_tpu.serve import ServerOverloaded

    def boom(*a, **k):
        raise AssertionError("image decode ran before the shed check")

    srv = PipelineServer(server.pipe, port=0)
    try:
        monkeypatch.setattr(serve_mod, "_b64_to_image", boom)
        srv.draining = True
        with pytest.raises(ServerOverloaded):
            srv.generate({"mode": "img2img", "prompt": "x", "steps": 2,
                          "image": _rand_image_png(), "strength": 1.0})
        srv.draining = False
        srv.max_queue = 0  # queued_rows >= max_queue trips immediately
        with pytest.raises(ServerOverloaded):
            srv.generate({"mode": "inpaint", "prompt": "x", "steps": 2,
                          "image": _rand_image_png(), "mask": _mask_png()})
        assert srv.shed_count == 2
    finally:
        srv.stop()


def test_crash_restores_accounting_and_drain_unblocks():
    """After a scheduler crash every stranded request's admit-time
    accounting is undone — /metrics queued_rows returns to 0 and the
    SIGTERM drain() returns immediately instead of blocking its full
    timeout on requests the dead scheduler will never pull. Also covers
    the enqueue race: a request admitted in the window between the fatal
    flag being set and checked is reaped by its own watchdog tick."""
    import threading

    from lora_tpu.serve import PipelineServer, SchedulerDown, _Pending

    pipe = StableDiffusionPipeline.random_init(
        jax.random.PRNGKey(0), unet_cfg=TINY_UNET, text_cfg=TINY_TEXT,
        vae_cfg=TINY_VAE)
    srv = PipelineServer(pipe, port=0)
    try:
        release = threading.Event()

        def boom():
            release.wait(60)
            raise RuntimeError("collector exploded")

        srv._collect = boom
        # the worker is blocked inside the ORIGINAL _collect; one request
        # flows through it, after which the next loop iteration hits boom()
        out = srv.generate({"prompt": "last good", "steps": 2,
                            "height": 64, "width": 64, "seed": 1})
        assert len(out["images"]) == 1
        errs = {}

        def waiter(name):
            try:
                srv.generate({"prompt": name, "steps": 2,
                              "height": 64, "width": 64})
            except Exception as e:
                errs[name] = e

        t1 = threading.Thread(target=waiter, args=("stranded",))
        t1.start()
        deadline = time.monotonic() + 30
        while srv._queue.qsize() == 0 and time.monotonic() < deadline:
            time.sleep(0.01)
        assert srv.metrics()["queued_rows"] == 1
        release.set()
        t1.join(timeout=30)
        assert isinstance(errs["stranded"], SchedulerDown)
        m = srv.metrics()
        assert m["queued_rows"] == 0, "crash-drain leaked queued_rows"
        assert m["inflight"] == 0, "crash-drain leaked inflight"
        # enqueue race: slip a request past the fatal check the way a
        # thread that read _fatal just before the crash would
        fatal, srv._fatal = srv._fatal, None
        t2 = threading.Thread(target=waiter, args=("racer",))
        t2.start()
        deadline = time.monotonic() + 30
        while srv._queue.qsize() == 0 and time.monotonic() < deadline:
            time.sleep(0.01)
        assert srv.metrics()["inflight"] == 1
        srv._fatal = fatal
        t2.join(timeout=30)  # watchdog tick is 2 s
        assert not t2.is_alive(), "racer HUNG on a dead scheduler"
        assert isinstance(errs["racer"], SchedulerDown)
        m = srv.metrics()
        assert m["queued_rows"] == 0 and m["inflight"] == 0
        assert srv.drain(timeout=5) is True, (
            "drain() blocked on requests the dead scheduler will never pull")
    finally:
        srv.stop()


def test_base_exception_in_group_gets_scheduler_down():
    """A BaseException escaping _run_group must give the IN-FLIGHT group
    the same SchedulerDown contract as queued waiters — not a silent
    done.set() with images=None that surfaces as a client-side 400
    TypeError."""
    from lora_tpu.serve import PipelineServer, SchedulerDown

    pipe = StableDiffusionPipeline.random_init(
        jax.random.PRNGKey(0), unet_cfg=TINY_UNET, text_cfg=TINY_TEXT,
        vae_cfg=TINY_VAE)
    srv = PipelineServer(pipe, port=0)
    try:
        def boom(group):
            raise SystemExit("operator pulled the plug")

        srv._run_group = boom
        with pytest.raises(SchedulerDown):
            srv.generate({"prompt": "inflight", "steps": 2,
                          "height": 64, "width": 64})
        m = srv.metrics()
        assert m["scheduler_alive"] is False
        assert m["queued_rows"] == 0 and m["inflight"] == 0
        assert srv.drain(timeout=5) is True
    finally:
        srv.stop()


def test_serve_cli_list_flags_validated_before_model_load():
    """--batch_buckets / --warmup_modes are parsed (with whitespace strip)
    and validated at argparse time: a typo exits 2 with a pointed message
    instead of crashing after minutes of model load + warmup."""
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "-m", "lora_tpu.serve", "--model", "/nonexistent",
         "--batch_buckets", "1, x"],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 2
    assert "comma-separated ints" in r.stderr
    r = subprocess.run(
        [sys.executable, "-m", "lora_tpu.serve", "--model", "/nonexistent",
         "--warmup_modes", " txt2img , badmode"],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 2
    # the stripped name appears — proving ' txt2img ' itself passed
    assert "unknown mode 'badmode'" in r.stderr
