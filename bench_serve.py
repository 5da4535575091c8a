"""Serving benchmark: end-to-end txt2img latency and multi-LoRA batched
throughput on one chip (the production-serving counterpart of bench.py's
training headline).

Prints one JSON line:
  {"metric": "serving", "single_latency_s": ..., "throughput": {bs: imgs/s},
   "multi_lora_throughput": {bs: imgs/s},
   "offered_load": [{"load_x": 0.5, ...}, {"load_x": 0.9, ...},
                    {"load_x": 1.2, ...}]}

The offered_load section drives the REAL PipelineServer (HTTP + deadline-
aware micro-batching) with uniform arrivals at 0.5x / 0.9x / 1.2x of the
measured bs-8 capacity (n>=60 requests each) and reports client-observed
p50/p95 latency, shed rate, and the exec-time EWMA at the end of the run.
max_queue bounds queued work to ~2 batches, so the 1.2x overload point must
SHED (503) rather than queue into unbounded latency — asserted, exit 1 if
it absorbed everything. Exit 1 likewise if p95 at 0.9x regresses >2x from
the recorded value (P95_RECORDED_AT_09, updated with PERF.md).

Measures the real pipeline object (random weights — identical compute graph
to trained SD-1.5 weights): 50-step CFG sampling, bf16, 512px, Pallas flash
attention, with the multi-LoRA rows routing 4 stacked rank-4 adapters
per-sample (`stack_loras` + `lora_idx` — the serve.py micro-batching path).
Reference counterpart: plain diffusers `pipe(prompt)` after `patch_pipe`
(lora.py:958-1022); the reference serves one adapter per process.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import bench_common

if __name__ == "__main__":
    # probe BEFORE any in-process backend touch; a bare import of this
    # module (CPU smokes) must not probe or exit
    bench_common.require_backend_or_exit("serving")

import jax
import jax.numpy as jnp

from lora_tpu.utils import compile_cache

compile_cache.enable("/root/repo/.jax_cache")

STEPS = 50
REPS = 3
# p95 at the 0.9x load point from the last accepted capture (PERF.md's
# serving table); None = no record yet. The gate trips at >2x this.
P95_RECORDED_AT_09 = 26.7  # round-5 capture, n=64


def _build_pipe():
    from lora_tpu.pipelines.sd import StableDiffusionPipeline

    return StableDiffusionPipeline.random_init(
        rng=jax.random.PRNGKey(0), dtype=jnp.bfloat16)


def _run(pipe, prompts, rng, lora_idx=None, output_type="device"):
    # device output by default: through this environment's remote tunnel a
    # host copy of a batch of images costs seconds and would measure the
    # relay, not the chip (on a real TPU VM the PCIe copy is ~ms); the
    # end-to-end rows measure output_type="np" separately
    return pipe(prompts, num_inference_steps=STEPS, guidance_scale=7.5,
                rng=rng, lora_idx=lora_idx, output_type=output_type)


def _offered_load(pipe, rate_rps: float, n: int = 64, load_x: float = None,
                  warm_frac: float = 0.25, max_queue: int = 16) -> dict:
    """Client-observed latency through the real HTTP server at a stated
    offered load (uniform arrivals), after srv.warmup() has compiled every
    bucket shape (deploy-time warmup — its cost is reported separately as
    warmup_s). The first `warm_frac` of requests are still excluded from
    the percentiles to drop scheduler ramp-up.

    max_queue=16 rows bounds queued work to ~2 device batches: at sub-
    capacity loads the transient backlog while a batch executes (<~1 batch
    of rows) stays under it, while sustained overload crosses it and SHEDS
    instead of queueing into unbounded latency."""
    import threading
    import urllib.request

    from lora_tpu.serve import PipelineServer

    srv = PipelineServer(pipe, port=0, max_batch=8,
                         max_queue=max_queue).start()
    results = [None] * n
    warm_s = srv.warmup(steps=STEPS)  # compile all bucket shapes up front
    try:
        def post(i):
            payload = {"prompt": f"a photo of sks dog {i % 4}",
                       "steps": STEPS, "seed": i}
            req = urllib.request.Request(
                f"http://127.0.0.1:{srv.port}/generate",
                data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"})
            t0 = time.perf_counter()
            try:
                with urllib.request.urlopen(req, timeout=1200) as r:
                    json.loads(r.read())
                results[i] = time.perf_counter() - t0
            except Exception:
                results[i] = "shed"

        start = time.perf_counter()
        threads = []
        for i in range(n):
            delay = start + i / rate_rps - time.perf_counter()
            if delay > 0:
                time.sleep(delay)
            t = threading.Thread(target=post, args=(i,))
            t.start()
            threads.append(t)
        for t in threads:
            t.join()
        wall = time.perf_counter() - start
    finally:
        srv.stop()

    lats = sorted(r for r in results[int(n * warm_frac):]
                  if isinstance(r, float))
    # client-observed sheds only — srv.shed_count counts the SAME events
    # server-side (kept below as a cross-check, not summed in)
    shed = sum(1 for r in results if r == "shed")
    if not lats:
        return {"load_x": load_x, "offered_rps": round(rate_rps, 3),
                "error": "all shed", "shed": shed, "n": n}
    return {
        "load_x": load_x,
        "offered_rps": round(rate_rps, 3),
        "warmup_s": round(warm_s, 1),
        "achieved_rps": round((n - shed) / wall, 3),
        "p50_s": round(lats[len(lats) // 2], 3),
        "p95_s": round(lats[min(len(lats) - 1, int(len(lats) * 0.95))], 3),
        "shed": shed,
        "shed_rate": round(shed / n, 3),
        "server_shed_count": srv.shed_count,
        # EWMA of batch execution time at end-of-run: drift here under
        # sustained load means the coalescer's deadline estimates walked
        "exec_ewma_s": round(srv._exec_ewma, 3) if srv._exec_ewma else None,
        "n": n,
    }


def main():
    from lora_tpu.core.lora import init_lora, stack_loras

    pipe = _build_pipe()
    sites = pipe.unet_sites()

    out = {"metric": "serving", "steps": STEPS, "resolution": 512}

    # single-request latency (one adapter patched, the common serving case):
    # device-complete, and end-to-end including the image download
    pipe.lora_unet = init_lora(sites, r=4, rng=jax.random.PRNGKey(1))
    _run(pipe, ["warmup"], jax.random.PRNGKey(9))  # compile
    lat, lat_np = [], []
    for i in range(REPS):
        t0 = time.perf_counter()
        _run(pipe, ["a photo of sks dog"], jax.random.PRNGKey(10 + i))
        lat.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        _run(pipe, ["a photo of sks dog"], jax.random.PRNGKey(10 + i),
             output_type="np")
        lat_np.append(time.perf_counter() - t0)
    out["single_latency_s"] = round(min(lat), 3)
    out["single_latency_with_host_copy_s"] = round(min(lat_np), 3)

    # batched throughput, same adapter for all rows
    thr = {}
    for bs in (4, 8):
        _run(pipe, ["w"] * bs, jax.random.PRNGKey(20))  # compile
        best = 0.0
        for i in range(REPS):
            t0 = time.perf_counter()
            _run(pipe, ["a photo of sks dog"] * bs,
                 jax.random.PRNGKey(30 + i))
            best = max(best, bs / (time.perf_counter() - t0))
        thr[str(bs)] = round(best, 2)
    out["throughput_imgs_per_s"] = thr

    # multi-LoRA: 4 distinct rank-4 adapters, rows routed per-sample
    adapters = [init_lora(sites, r=4, rng=jax.random.PRNGKey(40 + i))
                for i in range(4)]
    pipe.lora_unet = stack_loras(adapters)
    mthr = {}
    for bs in (4, 8):
        idx = jnp.arange(bs) % 4
        _run(pipe, ["w"] * bs, jax.random.PRNGKey(50), lora_idx=idx)
        best = 0.0
        for i in range(REPS):
            t0 = time.perf_counter()
            _run(pipe, ["a photo of sks dog"] * bs,
                 jax.random.PRNGKey(60 + i), lora_idx=idx)
            best = max(best, bs / (time.perf_counter() - t0))
        mthr[str(bs)] = round(best, 2)
    out["multi_lora_throughput_imgs_per_s"] = mthr

    # offered-load sweep through the real server: 0.5x / 0.9x / 1.2x of
    # measured bs-8 capacity, n>=60 each (VERDICT r3 item 6)
    pipe.lora_unet = init_lora(sites, r=4, rng=jax.random.PRNGKey(1))
    cap = max(thr.values())
    sweep = []
    # 1.2x runs longer: backlog grows ~0.2x capacity rows/s, so the queue
    # bound (16 rows) is crossed decisively only after ~80s of overload
    for load_x, n in ((0.5, 64), (0.9, 64), (1.2, 96)):
        sweep.append(_offered_load(pipe, load_x * cap, n=n, load_x=load_x))
    out["offered_load"] = sweep

    print(json.dumps(out))

    failures = []
    over = sweep[-1]
    if not over.get("shed"):
        failures.append(
            "1.2x overload point shed nothing — queue bound is not "
            "converting overload into 503s")
    p95_09 = sweep[1].get("p95_s")
    if (P95_RECORDED_AT_09 is not None and p95_09 is not None
            and p95_09 > 2 * P95_RECORDED_AT_09):
        failures.append(
            f"p95 at 0.9x regressed: {p95_09}s vs recorded "
            f"{P95_RECORDED_AT_09}s (>2x)")
    if failures:
        print("BENCH_SERVE_FAIL: " + "; ".join(failures), file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
