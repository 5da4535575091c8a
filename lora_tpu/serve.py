"""Minimal production-style serving endpoint.

Wraps a StableDiffusionPipeline behind an HTTP API (stdlib-only):

  POST /generate   {"prompt": str | [str], "steps": int, "guidance": float,
                    "height": int, "width": int, "seed": int,
                    "scheduler": str, "alpha": float, "lora_idx": [int],
                    "deadline_ms": float,
                    "mode": "txt2img" | "img2img" | "inpaint",
                    "image": base64 PNG | [base64 PNG, ...],
                    "mask": base64 PNG | [...], "strength": float}
                   -> {"images": [base64 PNG, ...], "latency_ms": float,
                       "batched_with": int}
                   -> 503 {"error": ...} when queued ROWS reach max_queue
                      (prompt lists count once per prompt) or the server is
                      draining for shutdown
  GET  /healthz    -> {"ok": true, "devices": [...], "draining": bool}
  GET  /metrics    -> counters: requests/images served, shed count, embed
                      cache hits/misses, queue depth, exec-time EWMA,
                      uptime — everything an autoscaler or dashboard needs

Concurrent requests with the same sampling config (steps/guidance/size/
scheduler/alpha) are MICRO-BATCHED: a worker thread coalesces them (up to
`max_batch`, within `batch_window_ms`, cut early when a member's
`deadline_ms` budget minus the EWMA-estimated batch execution time is about
to be spent) into one device batch, padded up to a power-of-two bucket so
only len(batch_buckets) XLA programs ever compile — each request
keeps its own prompt, seed-derived latents, and `lora_idx` adapter routing.
Measured batch scaling (PERF.md): ~1.45x image throughput at bs 8 vs bs 1,
so coalescing converts concurrency into throughput with no quality change.
The first request per (config, batch-size) pays the XLA compile; later ones
run at device speed. With a stacked multi-LoRA (core.lora.stack_loras) one
server serves K adapters.

Image modes: mode="img2img" takes a base64 PNG `image` (its size defines
the sampling size; one PNG per prompt row, or a single PNG replicated);
mode="inpaint" additionally takes a same-size `mask` PNG (luma >= 128 =
repaint) and routes to the pipe's inpainting path (the 9-channel UNet if
the checkpoint has one, the latent-blend technique otherwise — SDXL is
always blend). Image modes micro-batch and bucket exactly like txt2img,
coalescing on (mode, strength, size, steps, guidance, scheduler, alpha);
their noise (VAE posterior sample + init noise) is drawn batch-wide from
the FIRST member's seed, so reproducibility is per (seed, batch
composition) rather than per row. Prompt conditioning comes from the same
embed cache as txt2img (prompt_embeds passthrough on every image-mode
pipeline call). img2img and the 9-channel inpaint sample with ddim; blend
inpainting takes any scheduler but pndm.
"""

from __future__ import annotations

import base64
import io
import json
import os
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np


def _png_b64(arr: np.ndarray) -> str:
    from PIL import Image

    img = Image.fromarray((np.clip(arr, 0, 1) * 255).astype(np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def _b64_to_image(b64s, n_rows: int) -> np.ndarray:
    """Decode base64 PNG(s) to (n_rows, H, W, 3) float32 in [-1,1]. A
    single string is replicated across rows; a list must carry one entry
    per prompt row, all the same size (one device batch = one shape)."""
    from PIL import Image

    items = [b64s] * n_rows if isinstance(b64s, str) else list(b64s)
    if len(items) != n_rows:
        raise ValueError(
            f"'image' carries {len(items)} PNGs for {n_rows} prompt rows")
    rows = []
    for s in items:
        img = Image.open(io.BytesIO(base64.b64decode(s))).convert("RGB")
        rows.append(np.asarray(img, np.float32) / 127.5 - 1.0)
    if any(r.shape != rows[0].shape for r in rows):
        raise ValueError("all 'image' PNGs in one request must share a size")
    return np.stack(rows)


def _b64_to_mask(b64s, n_rows: int, hw: tuple) -> np.ndarray:
    """Decode base64 PNG(s) to a binary (n_rows, H, W, 1) float32 mask
    (luma >= 128 -> 1.0 = repaint), validated against the image size."""
    from PIL import Image

    items = [b64s] * n_rows if isinstance(b64s, str) else list(b64s)
    if len(items) != n_rows:
        raise ValueError(
            f"'mask' carries {len(items)} PNGs for {n_rows} prompt rows")
    rows = []
    for s in items:
        img = Image.open(io.BytesIO(base64.b64decode(s))).convert("L")
        m = (np.asarray(img, np.float32) >= 128.0).astype(np.float32)
        if m.shape != tuple(hw):
            raise ValueError(
                f"mask size {m.shape} does not match image size {tuple(hw)}")
        rows.append(m[..., None])
    return np.stack(rows)


class ServerOverloaded(Exception):
    """Queue bound exceeded — shed with HTTP 503 instead of queueing into
    certain deadline misses."""


class SchedulerDown(Exception):
    """The micro-batching scheduler thread died (HTTP 500): the server can
    no longer execute work and healthz reports unhealthy — restart it."""


class _Pending:
    """One enqueued request awaiting its slot in a micro-batch."""

    def __init__(self, req: dict):
        self.req = req
        self.done = threading.Event()
        self.images = None
        self.error: Optional[Exception] = None
        self.batched_with = 1
        # crash-path accounting (guarded by the server's _shed_lock):
        # _dequeued = _collect already took our rows off _queued_rows;
        # _failed = a crash path already failed us (idempotence flag)
        self._dequeued = False
        self._failed = False
        self.t0 = time.monotonic()
        pr = req.get("prompt", "")
        self.n_rows = 1 if isinstance(pr, str) else len(pr)
        # absolute latency budget; None = no deadline (fixed-window only)
        d = req.get("deadline_ms")
        self.deadline = self.t0 + float(d) / 1000.0 if d is not None else None
        self.mode = req.get("mode", "txt2img")
        if self.mode not in ("txt2img", "img2img", "inpaint"):
            raise ValueError(f"unknown mode {self.mode!r}; expected "
                             "txt2img | img2img | inpaint")
        self.image = self.mask = None
        if self.mode != "txt2img":
            if req.get("image") is None:
                raise ValueError(
                    f"mode {self.mode!r} requires a base64 PNG 'image'")
            self.image = _b64_to_image(req["image"], self.n_rows)
            # the init image defines the sampling size; key() groups by it
            req["height"] = int(self.image.shape[1])
            req["width"] = int(self.image.shape[2])
            if self.mode == "inpaint":
                if req.get("mask") is None:
                    raise ValueError(
                        "mode 'inpaint' requires a base64 PNG 'mask'")
                self.mask = _b64_to_mask(req["mask"], self.n_rows,
                                         self.image.shape[1:3])
        # coerce EVERY field the scheduler thread would otherwise touch NOW,
        # inside the requester's thread: malformed fields are rejected as a
        # 400 at admit time. Deferring any coercion to the scheduler would
        # crash _drain's batch (failing innocent coalesced members) or, for
        # key(), hang every later request.
        try:
            self.seed = int(req.get("seed", 0))
            li = req.get("lora_idx")
            if li is None:
                self.lora_idx: Optional[list] = None
            else:
                items = li if isinstance(li, list) else [li] * self.n_rows
                if len(items) != self.n_rows:
                    raise ValueError(
                        f"'lora_idx' carries {len(items)} entries for "
                        f"{self.n_rows} prompt rows")
                self.lora_idx = [int(i) for i in items]
            self._key = (
                int(req.get("steps", 30)), float(req.get("guidance", 7.5)),
                int(req.get("height", 512)), int(req.get("width", 512)),
                req.get("scheduler", "ddim"), req.get("alpha"),
                req.get("negative_prompt", ""),
                self.lora_idx is not None,
                self.mode,
                (float(req.get("strength", 0.8))
                 if self.mode != "txt2img" else None))
        except (TypeError, ValueError) as e:
            raise ValueError(f"malformed request field: {e}")

    def key(self):
        return self._key


class PipelineServer:
    def __init__(self, pipe, host: str = "127.0.0.1", port: int = 8500,
                 max_batch: int = 8, batch_window_ms: float = 25.0,
                 embed_cache_size: int = 256, max_queue: int = 32,
                 batch_buckets: Optional[tuple] = None):
        self.pipe = pipe
        # SDXL pipes condition on (context, te2 pooled) pairs; the embed
        # cache stores the pair per prompt and the pipe call receives both
        self._is_xl = hasattr(pipe, "encode_prompt_xl")
        self.lock = threading.Lock()
        self.max_batch = max_batch
        self.batch_window = batch_window_ms / 1000.0
        # allowed device batch sizes (see _run_group); default: powers of
        # two up to max_batch, bounding the compiled-program count
        if batch_buckets is None:
            batch_buckets = tuple(b for b in (1, 2, 4, 8, 16, 32, 64)
                                  if b < max_batch) + (max_batch,)
        self.batch_buckets = tuple(sorted(set(batch_buckets)))
        # invariant the coalescer + warmup rely on: every group it cuts
        # (rows <= max_batch) pads up into SOME warmed bucket — no live
        # request ever meets an uncompiled shape
        if self.batch_buckets[-1] != max_batch:
            raise ValueError(
                f"largest batch bucket {self.batch_buckets[-1]} must equal "
                f"max_batch {max_batch}, or batches between them would "
                f"compile fresh shapes at serve time")
        self.last_device_batch = 0
        # backpressure: work beyond this many queued ROWS (prompt-list
        # requests count once per prompt) is shed with 503 rather than
        # queued into certain deadline misses
        self.max_queue = max_queue
        self.shed_count = 0
        self._queued_rows = 0  # rows admitted but not yet pulled into a batch
        self._shed_lock = threading.Lock()  # row check + count are atomic
        # graceful drain: once set, new requests are shed with 503 while
        # everything already admitted finishes (the serving counterpart of
        # the trainers' preemption checkpoint — lora_serve wires SIGTERM to
        # drain())
        self.draining = False
        self._inflight = 0            # admitted, not yet done.set()
        self._idle = threading.Condition(self._shed_lock)
        self.request_count = 0  # lifetime admits (monotonic, for /metrics)
        self.image_count = 0
        self._t_started = time.monotonic()
        # EWMA of recent batch execution seconds — the deadline-aware
        # coalescer's estimate of how long a batch will take once cut
        self._exec_ewma: Optional[float] = None
        # LRU prompt -> text-embedding cache: repeated prompts (and the
        # shared negative prompt) skip tokenize + CLIP forward entirely.
        # Keyed by (text, alpha) — with a text-encoder LoRA patched, the
        # embedding depends on the runtime scale.
        import collections
        self._embeds: "collections.OrderedDict" = collections.OrderedDict()
        self._embed_cache_size = embed_cache_size
        self._current_alpha = 1.0  # pipes patch/init at scale 1.0
        self.embed_cache_hits = 0
        self.embed_cache_misses = 0
        import queue

        self._queue: "queue.Queue[_Pending]" = queue.Queue()
        self._spill: Optional[_Pending] = None
        self._fatal: Optional[BaseException] = None
        self._worker = threading.Thread(target=self._drain, daemon=True)
        self._worker.start()
        server_self = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _send(self, code: int, payload: dict):
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    import jax

                    fatal = server_self._fatal
                    self._send(500 if fatal is not None else 200,
                               {"ok": fatal is None,
                                "draining": server_self.draining,
                                **({"fatal": repr(fatal)}
                                   if fatal is not None else {}),
                                "devices": [str(d) for d in
                                            jax.devices()]})
                elif self.path == "/metrics":
                    self._send(200, server_self.metrics())
                else:
                    self._send(404, {"error": "not found"})

            def do_POST(self):
                if self.path != "/generate":
                    self._send(404, {"error": "not found"})
                    return
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    req = json.loads(self.rfile.read(n) or b"{}")
                    out = server_self.generate(req)
                    self._send(200, out)
                except ServerOverloaded as e:
                    self._send(503, {"error": str(e)})
                except SchedulerDown as e:
                    self._send(500, {"error": str(e)})
                except Exception as e:
                    self._send(400, {"error": f"{type(e).__name__}: {e}"})

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self.httpd.server_address[1]
        self.thread: Optional[threading.Thread] = None

    def generate(self, req: dict) -> dict:
        t0 = time.perf_counter()
        if req.get("mode", "txt2img") != "txt2img":
            # cheap pre-check so an overloaded/draining server sheds image
            # modes BEFORE paying their base64+PNG decode (the authoritative
            # admit check below runs again after _Pending construction)
            with self._shed_lock:
                if self.draining or self._queued_rows >= self.max_queue:
                    self.shed_count += 1
                    raise ServerOverloaded(
                        "server is draining or at max_queue; retry with "
                        "backoff")
        pending = _Pending(req)
        if pending.n_rows < 1:
            # an empty prompt list would otherwise crash the whole coalesced
            # group later in _run_group's bucket padding (prompts[-1])
            raise ValueError("prompt must be a non-empty string or list")
        if pending.n_rows > self.max_batch:
            raise ValueError(
                f"prompt list of {pending.n_rows} exceeds max_batch "
                f"{self.max_batch}; split the request")
        self._check_image_mode(pending)
        if self._fatal is not None:
            raise SchedulerDown(
                f"serving scheduler crashed: {self._fatal!r}")
        with self._shed_lock:
            if self.draining:
                self.shed_count += 1
                raise ServerOverloaded(
                    "server is draining for shutdown; retry elsewhere")
            # backpressure is in ROWS, not requests: a request may carry a
            # prompt list, and queued latency scales with rows of work
            if self._queued_rows >= self.max_queue:
                self.shed_count += 1
                raise ServerOverloaded(
                    f"queued rows {self._queued_rows} >= max_queue "
                    f"{self.max_queue}; retry with backoff")
            self._inflight += 1
            self.request_count += 1
            self._queued_rows += pending.n_rows
            self._queue.put(pending)
        # watchdog wait, not an untimed block: if the scheduler thread dies
        # between our enqueue and its crash-drain, the fatal flag (set
        # before waiters are failed) still wakes us within one tick.
        # _fail_stranded (idempotent with the crash-drain) also undoes our
        # _inflight/_queued_rows accounting so SIGTERM drain() is not
        # blocked by a request the dead scheduler will never pull.
        while not pending.done.wait(timeout=2.0):
            if self._fatal is not None:
                self._fail_stranded(pending, SchedulerDown(
                    f"serving scheduler crashed: {self._fatal!r}"))
                break
        pending.done.wait()
        if pending.error is not None:
            raise pending.error
        with self._shed_lock:
            self.image_count += pending.n_rows
        return {"images": [_png_b64(im) for im in pending.images],
                "latency_ms": round((time.perf_counter() - t0) * 1000, 1),
                "batched_with": pending.batched_with}

    def _check_image_mode(self, pending: "_Pending") -> None:
        """Reject requests whose mode the checkpoint or routed pipeline
        path cannot honor, at admit time (400) rather than mid-batch —
        an invalid member must never burn a device-batch slot and surface
        as an opaque XLA shape error for the whole coalesced group."""
        nine_ch = (not self._is_xl
                   and getattr(self.pipe, "unet_cfg", None) is not None
                   and self.pipe.unet_cfg.in_channels
                   != self.pipe.unet_cfg.out_channels)
        if pending.mode == "txt2img":
            if nine_ch:
                raise ValueError(
                    "this checkpoint's UNet is a 9-channel inpainting UNet; "
                    "it serves mode='inpaint' only")
            return
        # reject sizes the UNet can't round-trip before they join a batch
        self.pipe._check_size(int(pending.image.shape[1]),
                              int(pending.image.shape[2]))
        sched = pending.req.get("scheduler", "ddim")
        if pending.mode == "img2img":
            if nine_ch:
                raise ValueError(
                    "this checkpoint's UNet is a 9-channel inpainting UNet; "
                    "img2img is not supported (use mode='inpaint')")
            if sched != "ddim":
                raise ValueError("img2img serving samples with ddim only")
        if pending.mode == "inpaint":
            if nine_ch:
                if sched != "ddim":
                    raise ValueError(
                        "9-channel inpainting serving samples with ddim only")
                if pending.req.get("lora_idx") is not None:
                    raise ValueError("lora_idx routing is not supported on "
                                     "the 9-channel inpainting path")
            elif sched == "pndm":
                raise ValueError("latent-blend inpainting does not support "
                                 "the pndm scheduler")

    # -- micro-batching worker ----------------------------------------------
    def _window_remaining(self, group, window_end: float) -> float:
        """Seconds the coalescer may still wait: the fixed window, cut
        early when any member's latency budget minus the EWMA-estimated
        batch execution time is nearly spent. Deadline-less requests fall
        back to the fixed window alone."""
        w = window_end - time.monotonic()
        est = self._exec_ewma or 0.0
        for p in group:
            if p.deadline is not None:
                w = min(w, p.deadline - est - time.monotonic())
        return w

    def _collect(self) -> list:
        """Block for one request, then coalesce same-config arrivals within
        the window (a config mismatch is spilled to seed the next batch).
        The window is deadline-aware: the batch is cut as soon as waiting
        longer would spend a member's remaining latency budget."""
        import queue

        first = self._spill or self._queue.get()
        self._spill = None
        group = [first]
        with self._shed_lock:  # first leaves the queue -> starts executing
            self._queued_rows -= first.n_rows
            first._dequeued = True
        rows = first.n_rows
        window_end = time.monotonic() + self.batch_window
        # cap by ROW count, not request count: requests may carry prompt
        # lists, and the bucketed device batch must never exceed max_batch
        # (the largest warmed bucket) or a fresh shape would compile
        while rows < self.max_batch:
            remaining = self._window_remaining(group, window_end)
            if remaining <= 0:
                break
            try:
                nxt = self._queue.get(timeout=remaining)
            except queue.Empty:
                break
            if (nxt.key() == first.key()
                    and rows + nxt.n_rows <= self.max_batch):
                group.append(nxt)
                rows += nxt.n_rows
                with self._shed_lock:
                    self._queued_rows -= nxt.n_rows
                    nxt._dequeued = True
            else:
                # the spill stays logically queued (it seeds the next batch),
                # so its rows remain counted against max_queue
                self._spill = nxt
                break
        return group

    def _note_exec_time(self, seconds: float) -> None:
        self._exec_ewma = (seconds if self._exec_ewma is None
                           else 0.3 * seconds + 0.7 * self._exec_ewma)

    def _fail_stranded(self, p: "_Pending", err: Exception) -> None:
        """Fail a pending the dead scheduler will never pull, undoing its
        admit-time accounting exactly once. Idempotent: callable from both
        the crash-drain and a waiter's watchdog without double-counting
        (the race window is a request enqueued while the crash-drain runs).
        Skips requests already completed or already in a cut group (whose
        rows _collect took off _queued_rows and whose _inflight the group
        finally-block settles)."""
        with self._idle:  # _idle shares _shed_lock
            if p.done.is_set() or p._failed:
                return
            p._failed = True
            if not p._dequeued:
                self._queued_rows -= p.n_rows
            self._inflight -= 1
            self._idle.notify_all()
        p.error = err
        p.done.set()

    def _drain(self):
        import queue

        try:
            while True:
                group = self._collect()
                t0 = time.monotonic()
                try:
                    self._run_group(group)
                    self._note_exec_time(time.monotonic() - t0)
                except Exception as e:
                    for p in group:
                        p.error = e
                except BaseException as e:
                    # a BaseException (SystemExit, KeyboardInterrupt...) is
                    # about to kill the scheduler: the in-flight group must
                    # see the same SchedulerDown contract as queued waiters,
                    # not a silent done.set() with images=None
                    for p in group:
                        p.error = SchedulerDown(
                            f"serving scheduler crashed: {e!r}")
                    raise
                finally:
                    for p in group:
                        p.batched_with = len(group)
                        p.done.set()
                    with self._idle:
                        self._inflight -= len(group)
                        if self._inflight == 0:
                            self._idle.notify_all()
        except BaseException as e:  # scheduler must never die SILENTLY:
            # record the fatal state (healthz flips unhealthy, admits are
            # refused) and fail every waiter so no request hangs forever
            self._fatal = e
            err = SchedulerDown(f"serving scheduler crashed: {e!r}")
            stranded = [self._spill] if self._spill is not None else []
            self._spill = None
            while True:
                try:
                    stranded.append(self._queue.get_nowait())
                except queue.Empty:
                    break
            for p in stranded:
                self._fail_stranded(p, err)
            import sys
            import traceback

            print("lora_serve: FATAL scheduler crash "
                  f"({len(stranded)} queued requests failed)",
                  file=sys.stderr)
            traceback.print_exc(file=sys.stderr)

    def _cached_embeds(self, texts: list, alpha) -> "np.ndarray":
        """Encode `texts`, serving repeats from the LRU cache (caller holds
        the pipe lock and has already applied `alpha`)."""
        import numpy as np

        missing = [t for t in dict.fromkeys(texts)
                   if (t, alpha) not in self._embeds]
        if missing:
            if self._is_xl:
                ctx, pooled = self.pipe.encode_prompt_xl(missing)
                for t, c, pl in zip(missing, np.asarray(ctx, np.float32),
                                    np.asarray(pooled, np.float32)):
                    self._embeds[(t, alpha)] = (c, pl)
            else:
                fresh = np.asarray(self.pipe.encode_prompt(missing),
                                   np.float32)
                for t, e in zip(missing, fresh):
                    self._embeds[(t, alpha)] = e
        self.embed_cache_misses += len(missing)
        self.embed_cache_hits += len(texts) - len(missing)
        rows = []
        for t in texts:
            self._embeds.move_to_end((t, alpha))
            rows.append(self._embeds[(t, alpha)])
        while len(self._embeds) > self._embed_cache_size:
            self._embeds.popitem(last=False)
        if self._is_xl:
            return (np.stack([r[0] for r in rows]),
                    np.stack([r[1] for r in rows]))
        return np.stack(rows)

    def _embed_key_alpha(self):
        """The embed cache's alpha key component. It uses the EFFECTIVE
        scale, not the request field: a request that omits alpha runs at
        whatever scale the pipe was last tuned to, and with a text-encoder
        LoRA patched the embeddings depend on it (keying on the raw
        request value served stale embeddings after an alpha change).
        Without a text LoRA the embeddings are scale-independent — one
        entry. The adapter generation invalidates entries when the pipe's
        LoRA/TI weights change by means other than tune_lora_scale (e.g.
        patch_pipe on a live server swaps the adapter at the same alpha —
        the old embeddings are stale). Caller holds the pipe lock."""
        gen = getattr(self.pipe, "adapter_generation", 0)
        has_text_lora = (self.pipe.lora_text is not None
                         or getattr(self.pipe, "lora_text2", None)
                         is not None
                         # LyCORIS norm/full modules patch text BASE
                         # params alpha-dependently (pipe.base_deltas)
                         or self.pipe.has_base_deltas("text_encoder")
                         or self.pipe.has_base_deltas("text_encoder_2"))
        return (gen, self._current_alpha) if has_text_lora else (gen, None)

    def _assemble_rows(self, group: list):
        """Flatten a coalesced group into device-batch rows. Returns
        (prompts, counts, lora_idx, pad): the flattened prompt rows padded
        up to the chosen bucket (replicating the last row; its outputs are
        discarded), per-request row counts for scatter-back, the merged
        per-row adapter routing (admit-time-validated `_Pending.lora_idx`,
        None unless every member routes — key() already keeps routed and
        unrouted requests apart), and the pad count. Shared by the txt2img
        and image-mode paths so batch-size bucketing (one XLA program per
        bucket — a cold compile of an odd coalesced size stalls the whole
        line) and routing cannot drift between them."""
        prompts, counts = [], []
        lora_idx: Optional[list] = []
        for p in group:
            pr = p.req.get("prompt", "")
            pr = [pr] if isinstance(pr, str) else list(pr)
            prompts += pr
            counts.append(len(pr))
            if lora_idx is not None and p.lora_idx is not None:
                lora_idx += p.lora_idx
            else:
                lora_idx = None
        n_real = len(prompts)
        bucket = next((b for b in self.batch_buckets if b >= n_real), n_real)
        self.last_device_batch = bucket
        pad = bucket - n_real
        if pad:
            prompts += [prompts[-1]] * pad
            if lora_idx is not None:
                lora_idx += [lora_idx[-1]] * pad
        return prompts, counts, lora_idx, pad

    def _run_group(self, group: list):
        import jax
        import jax.numpy as jnp

        if group[0].mode != "txt2img":
            self._run_image_group(group)
            return
        r0 = group[0].req
        height, width = int(r0.get("height", 512)), int(r0.get("width", 512))
        prompts, counts, lora_idx, pad = self._assemble_rows(group)
        latents = [self.pipe.prepare_latents(
            n, height, width, jax.random.PRNGKey(p.seed))
            for p, n in zip(group, counts)]
        guidance = float(r0.get("guidance", 7.5))
        negative = r0.get("negative_prompt", "")
        if pad:
            latents.append(jnp.repeat(latents[-1][-1:], pad, axis=0))
        with self.lock:
            alpha = r0.get("alpha")
            if alpha is not None:
                self.pipe.tune_lora_scale(float(alpha))
                self._current_alpha = float(alpha)
            emb = self._cached_embeds(prompts, self._embed_key_alpha())
            neg = (self._cached_embeds([negative] * len(prompts),
                                       self._embed_key_alpha())
                   if guidance > 1.0 else None)
            imgs = self.pipe(
                None,
                num_inference_steps=int(r0.get("steps", 30)),
                guidance_scale=guidance,
                height=height, width=width,
                scheduler=r0.get("scheduler", "ddim"),
                latents=jnp.concatenate(latents, 0),
                lora_idx=lora_idx,
                prompt_embeds=emb,
                negative_prompt_embeds=neg,
            )
        off = 0
        for p, n in zip(group, counts):
            p.images = imgs[off:off + n]
            off += n

    def _run_image_group(self, group: list):
        """img2img / inpaint micro-batch: rows are (prompt, image[, mask])
        triples, coalesced and bucket-padded exactly like txt2img (key()
        adds mode + strength, and the init image pins height/width). The
        group's randomness (VAE posterior sample + init noise) is drawn
        batch-wide from the FIRST member's seed — per-row exact seeding
        would need per-row posterior draws the pipelines don't expose, so
        image-mode reproducibility is per (seed, batch composition).
        Prompt conditioning comes from the same embed cache as txt2img
        (prompt_embeds passthrough on every image-mode pipeline call)."""
        import jax
        import jax.numpy as jnp

        r0 = group[0].req
        mode = group[0].mode
        prompts, counts, lora_idx, pad = self._assemble_rows(group)
        images = [p.image for p in group]
        masks = [p.mask for p in group if p.mask is not None]
        imgs_np = np.concatenate(images, 0)
        masks_np = np.concatenate(masks, 0) if masks else None
        if pad:
            imgs_np = np.concatenate(
                [imgs_np, np.repeat(imgs_np[-1:], pad, 0)], 0)
            if masks_np is not None:
                masks_np = np.concatenate(
                    [masks_np, np.repeat(masks_np[-1:], pad, 0)], 0)
        steps = int(r0.get("steps", 30))
        guidance = float(r0.get("guidance", 7.5))
        negative = r0.get("negative_prompt", "")
        strength = float(r0.get("strength", 0.8))
        scheduler = r0.get("scheduler", "ddim")
        rng = jax.random.PRNGKey(group[0].seed)
        image_dev = jnp.asarray(imgs_np)
        mask_dev = None if masks_np is None else jnp.asarray(masks_np)
        with self.lock:
            alpha = r0.get("alpha")
            if alpha is not None:
                self.pipe.tune_lora_scale(float(alpha))
                self._current_alpha = float(alpha)
            emb = self._cached_embeds(prompts, self._embed_key_alpha())
            neg = (self._cached_embeds([negative] * len(prompts),
                                       self._embed_key_alpha())
                   if guidance > 1.0 else None)
            if mode == "img2img":
                imgs = self.pipe.img2img(
                    None, image_dev, strength=strength,
                    num_inference_steps=steps, guidance_scale=guidance,
                    rng=rng, lora_idx=lora_idx, prompt_embeds=emb,
                    negative_prompt_embeds=neg)
            elif (not self._is_xl
                  and self.pipe.unet_cfg.in_channels
                  != self.pipe.unet_cfg.out_channels):
                imgs = self.pipe.inpaint(
                    None, image_dev, mask_dev,
                    num_inference_steps=steps, guidance_scale=guidance,
                    rng=rng, prompt_embeds=emb, negative_prompt_embeds=neg)
            elif self._is_xl:
                imgs = self.pipe.inpaint(
                    None, image_dev, mask_dev, strength=strength,
                    num_inference_steps=steps, guidance_scale=guidance,
                    rng=rng, scheduler=scheduler, lora_idx=lora_idx,
                    prompt_embeds=emb, negative_prompt_embeds=neg)
            else:
                imgs = self.pipe.inpaint_blend(
                    None, image_dev, mask_dev, strength=strength,
                    num_inference_steps=steps, guidance_scale=guidance,
                    rng=rng, scheduler=scheduler, lora_idx=lora_idx,
                    prompt_embeds=emb, negative_prompt_embeds=neg)
        off = 0
        for p, n in zip(group, counts):
            p.images = imgs[off:off + n]
            off += n

    def warmup(self, steps: int = 30, height: int = 512, width: int = 512,
               guidance: float = 7.5, scheduler: str = "ddim",
               modes: tuple = ("txt2img",), strength: float = 0.8) -> float:
        """Compile every bucketed batch shape up front (deploy-time warmup)
        so no live request ever pays an XLA compile — with bucketing this is
        a BOUNDED set of programs, which is the point of the buckets. Call
        once per distinct sampling config you intend to serve; include
        "img2img"/"inpaint" in `modes` to warm the image-mode programs at
        this size too (image-mode configs additionally key on strength,
        and the init image pins the size — warm the sizes you will
        actually receive). Returns the wall seconds spent."""
        t0 = time.monotonic()
        img = mask = None
        if any(m != "txt2img" for m in modes):
            from PIL import Image

            buf = io.BytesIO()
            Image.new("RGB", (width, height)).save(buf, format="PNG")
            img = base64.b64encode(buf.getvalue()).decode()
            buf = io.BytesIO()
            Image.new("L", (width, height), 255).save(buf, format="PNG")
            mask = base64.b64encode(buf.getvalue()).decode()
        for mode in modes:
            # fail a mode the checkpoint cannot serve LOUDLY at deploy time
            # (e.g. txt2img warmup on a 9-channel inpainting checkpoint),
            # with the same message a live request would get at admit
            self._check_image_mode(_Pending(
                {"prompt": "warmup probe", "mode": mode, "image": img,
                 "mask": mask if mode == "inpaint" else None,
                 "scheduler": scheduler, "strength": strength}))
            for b in self.batch_buckets:
                group = [_Pending({"prompt": f"warmup {i}", "steps": steps,
                                   "height": height, "width": width,
                                   "guidance": guidance,
                                   "scheduler": scheduler, "seed": i,
                                   "mode": mode, "strength": strength,
                                   "image": img,
                                   "mask": (mask if mode == "inpaint"
                                            else None)})
                         for i in range(b)]
                self._run_group(group)
        return time.monotonic() - t0

    def metrics(self) -> dict:
        """Counters for dashboards/autoscalers (also served at GET
        /metrics). Everything here is monotonic or instantaneous — safe to
        scrape at any rate."""
        with self._shed_lock:
            return {
                "uptime_s": round(time.monotonic() - self._t_started, 1),
                "requests": self.request_count,
                "images": self.image_count,
                "shed": self.shed_count,
                "inflight": self._inflight,
                "queue_depth": self._queue.qsize(),
                "queued_rows": self._queued_rows,
                "draining": self.draining,
                "last_device_batch": self.last_device_batch,
                "exec_ewma_s": (round(self._exec_ewma, 4)
                                if self._exec_ewma is not None else None),
                "embed_cache_hits": self.embed_cache_hits,
                "embed_cache_misses": self.embed_cache_misses,
                "scheduler_alive": self._fatal is None,
            }

    def drain(self, timeout: Optional[float] = None) -> bool:
        """Graceful shutdown, phase 1: stop admitting (new requests shed
        with 503 so the balancer retries elsewhere) and wait until every
        already-admitted request has completed. The serving counterpart of
        the trainers' preemption checkpoint — lora_serve wires SIGTERM to
        drain() then stop(). Returns True when fully drained, False on
        timeout (requests may still be mid-batch)."""
        with self._idle:
            self.draining = True
            return self._idle.wait_for(lambda: self._inflight == 0,
                                       timeout=timeout)

    def start(self):
        self.thread = threading.Thread(target=self.httpd.serve_forever,
                                       daemon=True)
        self.thread.start()
        return self

    def stop(self):
        # shutdown() blocks on serve_forever()'s exit handshake — on a
        # constructed-but-never-started server that would wait forever
        if self.thread is not None:
            self.httpd.shutdown()
        self.httpd.server_close()


def main():
    import argparse

    from .utils.compile_cache import enable as _enable_compile_cache

    _enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--lora", default=None)
    ap.add_argument("--port", type=int, default=8500)
    ap.add_argument("--quantize", action="store_true")
    ap.add_argument("--max_batch", type=int, default=8)
    ap.add_argument("--batch_window_ms", type=float, default=25.0)
    ap.add_argument("--max_queue", type=int, default=32)
    ap.add_argument("--batch_buckets", default=None,
                    help="comma-separated allowed device batch sizes "
                         "(largest must equal --max_batch); default: "
                         "powers of two up to max_batch")
    ap.add_argument("--no_warmup", action="store_true",
                    help="skip deploy-time compilation of the batch "
                         "buckets (first live request per bucket then "
                         "pays the XLA compile)")
    ap.add_argument("--warmup_steps", type=int, default=30,
                    help="sampler steps used for the warmup config")
    ap.add_argument("--warmup_modes", default="txt2img",
                    help="comma-separated modes to warm "
                         "(txt2img,img2img,inpaint); image modes warm at "
                         "the default 512px size")
    args = ap.parse_args()
    # parse/validate the comma-separated lists up front: a natural
    # "txt2img, img2img" or "1, 2" must not crash after model load with an
    # unrelated-looking error from deep inside warmup
    try:
        buckets = (tuple(int(b.strip())
                         for b in args.batch_buckets.split(",") if b.strip())
                   if args.batch_buckets else None)
    except ValueError:
        ap.error(f"--batch_buckets: expected comma-separated ints, got "
                 f"{args.batch_buckets!r}")
    warm_modes = tuple(m.strip()
                       for m in args.warmup_modes.split(",") if m.strip())
    for m in warm_modes:
        if m not in ("txt2img", "img2img", "inpaint"):
            ap.error(f"--warmup_modes: unknown mode {m!r}; expected "
                     "txt2img | img2img | inpaint")
    if not warm_modes and not args.no_warmup:
        ap.error("--warmup_modes is empty; pass --no_warmup to skip warmup")

    import os as _os

    import jax.numpy as jnp

    # SDXL checkpoint dirs carry a second text encoder (same autodetect
    # as cli/lora_db): serve with the dual-encoder pipeline
    if _os.path.isdir(_os.path.join(args.model, "text_encoder_2")):
        from .pipelines.sdxl import StableDiffusionXLPipeline as _Pipe
    else:
        from .pipelines.sd import StableDiffusionPipeline as _Pipe

    pipe = _Pipe.from_pretrained(args.model, dtype=jnp.bfloat16)
    if args.lora:
        pipe.patch_pipe(args.lora)
    if args.quantize:
        pipe.quantize_base()
    srv = PipelineServer(pipe, port=args.port, max_batch=args.max_batch,
                         batch_window_ms=args.batch_window_ms,
                         max_queue=args.max_queue,
                         batch_buckets=buckets)
    if not args.no_warmup:
        # compile every bucket before taking traffic — the whole point of
        # bucketing is that this set is bounded
        spent = srv.warmup(steps=args.warmup_steps, modes=warm_modes)
        print(f"warmup compiled buckets {srv.batch_buckets} "
              f"({args.warmup_modes}) in {spent:.1f}s")
    srv.start()
    print(f"serving on :{srv.port}")

    # graceful shutdown: on SIGTERM/SIGINT stop admitting (503), finish
    # everything already in the queue, then exit — the serving counterpart
    # of the trainers' preemption checkpointing
    import signal

    stop_evt = threading.Event()
    signal.signal(signal.SIGTERM, lambda *_: stop_evt.set())
    signal.signal(signal.SIGINT, lambda *_: stop_evt.set())
    stop_evt.wait()
    print("draining...")
    drained = srv.drain(timeout=float(
        os.environ.get("LORA_TPU_DRAIN_TIMEOUT_S", 120)))
    srv.stop()
    print(f"drained={drained} served={srv.request_count} "
          f"shed={srv.shed_count}")


if __name__ == "__main__":
    main()
