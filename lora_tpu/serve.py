"""Minimal production-style serving endpoint.

Wraps a StableDiffusionPipeline behind an HTTP API (stdlib-only):

  POST /generate   {"prompt": str | [str], "steps": int, "guidance": float,
                    "height": int, "width": int, "seed": int,
                    "scheduler": str, "alpha": float, "lora_idx": [int]}
                   -> {"images": [base64 PNG, ...], "latency_ms": float}
  GET  /healthz    -> {"ok": true, "devices": [...]}

Requests are serialized through a lock (one compiled program, one device
stream); the first request per shape pays the compile, later ones run at
device speed. With a stacked multi-LoRA (core.lora.stack_loras) one server
serves K adapters via per-request `lora_idx`.
"""

from __future__ import annotations

import base64
import io
import json
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


class PipelineServer:
    def __init__(self, pipe, host: str = "127.0.0.1", port: int = 8500):
        self.pipe = pipe
        self.lock = threading.Lock()
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

                    self._send(200, {"ok": True,
                                     "devices": [str(d) for d in
                                                 jax.devices()]})
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
                except Exception as e:
                    self._send(400, {"error": f"{type(e).__name__}: {e}"})

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self.httpd.server_address[1]
        self.thread: Optional[threading.Thread] = None

    def generate(self, req: dict) -> dict:
        import jax

        prompt = req.get("prompt", "")
        t0 = time.perf_counter()
        with self.lock:
            if req.get("alpha") is not None:
                self.pipe.tune_lora_scale(float(req["alpha"]))
            imgs = self.pipe(
                prompt,
                negative_prompt=req.get("negative_prompt", ""),
                num_inference_steps=int(req.get("steps", 30)),
                guidance_scale=float(req.get("guidance", 7.5)),
                height=int(req.get("height", 512)),
                width=int(req.get("width", 512)),
                scheduler=req.get("scheduler", "ddim"),
                rng=jax.random.PRNGKey(int(req.get("seed", 0))),
                lora_idx=req.get("lora_idx"),
            )
        return {"images": [_png_b64(im) for im in imgs],
                "latency_ms": round((time.perf_counter() - t0) * 1000, 1)}

    def start(self):
        self.thread = threading.Thread(target=self.httpd.serve_forever,
                                       daemon=True)
        self.thread.start()
        return self

    def stop(self):
        self.httpd.shutdown()


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--lora", default=None)
    ap.add_argument("--port", type=int, default=8500)
    ap.add_argument("--quantize", action="store_true")
    args = ap.parse_args()

    import jax.numpy as jnp

    from .pipelines.sd import StableDiffusionPipeline

    pipe = StableDiffusionPipeline.from_pretrained(args.model,
                                                   dtype=jnp.bfloat16)
    if args.lora:
        pipe.patch_pipe(args.lora)
    if args.quantize:
        pipe.quantize_base()
    srv = PipelineServer(pipe, port=args.port).start()
    print(f"serving on :{srv.port}")
    srv.thread.join()


if __name__ == "__main__":
    main()
