"""Serving CLI: a long-lived sampling server over one warm-compiled graph.

The reference has no serving story — its sampler scripts pay model build +
checkpoint load + (on TPU, minutes of) compilation per invocation
(`/root/reference/sampling_6d.py:33-162`). For production deployment the
economics invert: load the EMA params once, compile the sampler once at a
fixed shape, then answer requests forever at marginal cost. TPU specifics
drive the design:

  * ONE compiled program: requests are micro-batched to the fixed
    (batch_size, N, N, C) shape (partial batches are padded with duplicate
    rows and the padding discarded), captions go through the encoder's
    existing pad_to_bucket, so no request pattern can retrace/recompile.
  * ONE sampler thread owns the device: HTTP handler threads enqueue
    (request, event) pairs; the worker drains the queue up to batch_size
    (waiting at most --max_wait_ms for stragglers to fill the batch),
    runs the trajectory, and publishes per-request results.
  * memory-lean EMA restore (`training.restore_ema_params`) and chunked
    launches (`pick_chunk`) exactly like the offline CLIs.

Endpoints (stdlib http.server; zero new dependencies):
  GET  /healthz     -> {"status": "ok", "step": ..., "platform": ...}
  POST /v1/sample   -> body {"caption": str, "length": int, "seed": int?,
                       "realize": bool?}; response {"length", "nfe",
                       "coords_6d_b64": base64 npz {"coords_6d": (C,N,N)},
                       "pdb": str?, "energy": float?}

Usage:
  python -m text2protein_tpu.cli.serve <config> <checkpoint> \
      [--batch_size 8] [--port 8080] [--sampler pc|ode|hybrid] [--realize]
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path


def build_parser():
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("config", type=str)
    p.add_argument("checkpoint", type=str)
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--sampler", type=str, default=None,
                   choices=["pc", "ode", "hybrid"],
                   help="override sampling.method (hybrid = deployment "
                        "default quality/NFE trade)")
    p.add_argument("--num_steps", type=int, default=None)
    p.add_argument("--max_wait_ms", type=int, default=50,
                   help="how long the batcher waits for more requests "
                        "before dispatching a partial batch")
    p.add_argument("--realize", action="store_true",
                   help="allow per-request 3D realization (adds the "
                        "restraint-minimization stage)")
    p.add_argument("--warmup", action="store_true",
                   help="compile + run one dummy batch before serving")
    return p


class _Server:
    """Owns the model, the compiled sampler, and the batching worker."""

    def __init__(self, args):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from ..config import load_config
        from ..diffusion import get_sde
        from ..diffusion.sampling import get_sampling_fn, pick_chunk
        from ..models import build_model
        from ..text import build_text_encoder
        from ..training import restore_ema_params

        self.jnp, self.np = jnp, np
        config = load_config(args.config)
        if args.sampler:
            config.sampling.method = args.sampler
        self.config = config
        self.n = config.data.max_res_num
        self.c = config.data.num_channels
        self.b = args.batch_size
        self.realize_enabled = args.realize

        sde, eps = get_sde(config)
        model = build_model(config)
        self.encoder = build_text_encoder(config)

        ckpt = Path(args.checkpoint)
        dummy = {
            "coords_6d": jnp.zeros((self.b, self.n, self.n, self.c),
                                   jnp.float32),
            "context": jnp.zeros((self.b, 8, config.model.context_dim),
                                 jnp.float32),
            "context_mask": jnp.zeros((self.b, 8), bool),
        }
        self.params, self.step = restore_ema_params(
            ckpt.parent.parent, config, model, dummy,
            checkpoint=ckpt if ckpt.exists() else None,
        )
        n_traj = args.num_steps or sde.N
        self.sampler = get_sampling_fn(
            config, sde, model, (self.b, self.n, self.n, self.c), eps,
            num_steps=args.num_steps,
            chunk_size=pick_chunk(n_traj, 100 if self.n >= 256 else 500),
        )
        self.platform = jax.devices()[0].platform

        self.q: queue.Queue = queue.Queue()
        # entropy base: unseeded requests must not replay the same samples
        # after a server restart (explicit seeds remain fully reproducible)
        import os

        self.counter = int.from_bytes(os.urandom(4), "little")
        self.lock = threading.Lock()
        self.max_wait_s = args.max_wait_ms / 1000.0
        self.worker = threading.Thread(target=self._loop, daemon=True)
        self.worker.start()

    # -- request plumbing -----------------------------------------------------
    def submit(self, req: dict) -> dict:
        """Called from handler threads; blocks until the batch containing
        this request completes."""
        done = threading.Event()
        slot = {"req": req, "done": done, "result": None}
        self.q.put(slot)
        done.wait()
        return slot["result"]

    def _next_seed(self):
        with self.lock:
            self.counter += 1
            return self.counter

    def _loop(self):
        pending = []
        while True:
            slots = [pending.pop(0) if pending else self.q.get()]
            # A request with an explicit seed is dispatched in its OWN batch:
            # the whole batch samples under one PRNG key, so reproducibility
            # of a seeded request must not depend on who it shares a batch
            # with. Unseeded requests micro-batch freely.
            if "seed" not in slots[0]["req"]:
                deadline = time.monotonic() + self.max_wait_s
                while len(slots) < self.b:
                    remaining = deadline - time.monotonic()
                    if remaining <= 0:
                        break
                    try:
                        nxt = self.q.get(timeout=remaining)
                    except queue.Empty:
                        break
                    if "seed" in nxt["req"]:
                        pending.append(nxt)  # runs in its own next batch
                    else:
                        slots.append(nxt)
            try:
                results = self._run_batch([s["req"] for s in slots])
            except Exception as e:  # surface the error to every waiter
                results = [{"error": f"{type(e).__name__}: {e}"}] * len(slots)
            for s, r in zip(slots, results):
                s["result"] = r
                s["done"].set()

    # -- the actual work ------------------------------------------------------
    def _run_batch(self, reqs):
        import jax

        jnp, np = self.jnp, self.np
        from ..conditioning import length_mask

        b, n, c = self.b, self.n, self.c
        # pad the batch to the compiled shape by repeating the last request
        padded = list(reqs) + [reqs[-1]] * (b - len(reqs))
        lengths = jnp.asarray(
            [int(r.get("length", n)) for r in padded], jnp.int32
        )
        cond = {"length": length_mask(lengths, n)}
        emb, emb_mask = self.encoder.encode(
            [str(r.get("caption", "")) for r in padded]
        )
        seed = int(reqs[0].get("seed", self._next_seed()))
        sample, nfe = self.sampler(
            self.params, jax.random.PRNGKey(seed), condition=cond,
            context=jnp.asarray(emb), context_mask=jnp.asarray(emb_mask),
        )
        sample = np.asarray(sample)  # host sync (tunnel-safe barrier)

        out = []
        for i, r in enumerate(reqs):
            cnn = sample[i].transpose(2, 0, 1)  # reference (C, N, N) layout
            buf = io.BytesIO()
            np.savez_compressed(buf, coords_6d=cnn.astype(np.float32))
            item = {
                "length": int(r.get("length", n)),
                "nfe": int(nfe),
                "seed": seed,
                "coords_6d_b64": base64.b64encode(buf.getvalue()).decode(),
            }
            if r.get("realize") and self.realize_enabled:
                from ..data.pdbio import format_backbone_pdb
                from ..realize.minimize import realize_6d_sample

                L = item["length"]
                msk = np.zeros((n, n), np.float32)
                msk[:L, :L] = 1.0
                cnn = cnn.copy()
                cnn[-1] = msk
                bb, energy, _ = realize_6d_sample(cnn)
                item["pdb"] = format_backbone_pdb(bb)
                item["energy"] = float(energy)
            elif r.get("realize"):
                item["warning"] = "server started without --realize"
            out.append(item)
        return out


class _Handler(BaseHTTPRequestHandler):
    server_obj: _Server = None  # injected

    def log_message(self, fmt, *a):  # quiet access log
        pass

    def _send(self, code: int, payload: dict):
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        s = self.server_obj
        if self.path == "/healthz":
            self._send(200, {
                "status": "ok",
                "step": int(s.step),
                "platform": s.platform,
                "batch_size": s.b,
                "max_res_num": s.n,
                "sampler": str(s.config.sampling.get("method", "pc")),
            })
        else:
            self._send(404, {"error": "unknown path"})

    def do_POST(self):
        if self.path != "/v1/sample":
            self._send(404, {"error": "unknown path"})
            return
        s = self.server_obj
        try:
            length = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(length) or b"{}")
            L = int(req.get("length", s.n))
            if not (2 <= L <= s.n):
                raise ValueError(f"length must be in [2, {s.n}]")
        except (ValueError, json.JSONDecodeError) as e:
            self._send(400, {"error": str(e)})
            return
        result = s.submit(req)
        self._send(500 if "error" in result else 200, result)


def main(argv=None):
    args = build_parser().parse_args(argv)
    server_obj = _Server(args)
    if args.warmup:
        t0 = time.time()
        server_obj._run_batch([{"length": server_obj.n, "caption": ""}])
        print(f"warmup batch done in {time.time() - t0:.1f}s")

    handler = type("Handler", (_Handler,), {"server_obj": server_obj})
    httpd = ThreadingHTTPServer((args.host, args.port), handler)
    print(f"serving step-{server_obj.step} model on "
          f"http://{args.host}:{httpd.server_address[1]} "
          f"(platform {server_obj.platform}, batch {server_obj.b})")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    return httpd


if __name__ == "__main__":
    main()
