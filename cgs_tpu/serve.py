"""Mask-inference serving (framework extension; the reference's only
batch-inference surface is the offline `-process` folder walk,
main.py:1103-1223 — it has no online serving story).

TPU-idiomatic design: one `MaskPipeline` compiled at ONE static batch
shape, fed by a micro-batcher that coalesces concurrent requests for
up to `max_wait_ms` and pads them into a single dispatch. Requests
cost one H2D of 12 KB/frame; the device program is the same fused
critic+masker forward the offline path uses (pipeline.py), so serving
throughput tracks the bench number until the NIC saturates.

Run:  python -m cgs_tpu.serve --model my-run --port 8700
API:  POST /segment        body = PNG/JPEG (64x64 RGB; ?resize=1 to
                           auto-resize other sizes)
                           ?variant=raw|thresholded|crf
                           ?threshold=0.5   (thresholded only; crf
                           refines the raw soft mask like -process)
      -> image/png grayscale mask (input resolution);
         400 = client error, 503 = inference failure/overload
      POST /reload         -> hot-swap the run dir's current .pt
                           checkpoints into the live pipeline (zero
                           downtime; missing files keep the served
                           weights); JSON {reloaded: {name: bool}}
      GET  /healthz        -> JSON {status, dispatches, frames, ...}
      GET  /stats          -> same JSON

The flag grammar reuses the training CLI's (core/config.py): --model
picks the run directory whose fingerprinted .pt checkpoints to load,
--infer-batch caps the micro-batch (default 256 — latency-bound, not
the offline 16k), --bf16/--crf behave as in `-process`.

--serve-wire u8 quarters the device->host mask transfer (PNG-space
uint8 instead of f32; responses are 8-bit PNGs so `raw` stays
bit-identical) and, with --binarymaskthreshold, binarizes in-graph so
`thresholded` at the server threshold is exact too. Per-request custom
thresholds and --crf need the f32 probabilities and are rejected
(400) on the u8 wire.
"""

from __future__ import annotations

import io
import json
import queue
import threading
import time
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional
from urllib.parse import parse_qs, urlparse

import numpy as np

from cgs_tpu.core.config import Config, parse_args

VARIANTS = ("raw", "thresholded", "crf")


class _Server(ThreadingHTTPServer):
    """ThreadingHTTPServer's default accept backlog is 5 — a burst of
    concurrent clients (the micro-batcher's whole point) gets
    connection resets before the handler ever runs. 128 covers the
    batch-formation concurrency the batcher is sized for."""
    request_queue_size = 128
    daemon_threads = True


@dataclass
class _Request:
    frame: np.ndarray                  # (64, 64, 3) uint8
    done: threading.Event = field(default_factory=threading.Event)
    mask: Optional[np.ndarray] = None  # (64, 64) f32 soft mask, or
    #                                    uint8 0..255 under --serve-wire u8
    hard: Optional[np.ndarray] = None  # (64, 64) uint8 0/1 in-graph
    #                                    binarization (u8 wire +
    #                                    --binarymaskthreshold only)
    pred: float = 0.0
    error: Optional[str] = None        # batch-level failure message
    abandoned: bool = False            # submitter gave up (timeout)


class ServerError(RuntimeError):
    """Inference-side failure (device error, overload timeout) —
    mapped to HTTP 5xx, unlike client ValueErrors (400)."""


class MicroBatcher:
    """Coalesce concurrent requests into fixed-shape device dispatches.

    Two threads pipeline the work: the dispatch thread drains the
    queue (waiting at most `max_wait_ms` after the first request
    arrives, up to `batch` frames), pads to the static batch, and
    fires ONE async device dispatch; the completion thread performs
    the blocking D2H readback and completes the request events. Since
    jax dispatch is asynchronous, batch N+1 forms and launches while
    batch N's results are still in flight — on high-RTT links
    (tunneled TPUs) this hides the readback entirely. Static shapes
    mean exactly one compiled program regardless of arrival pattern.
    """

    def __init__(self, pipeline, batch: int, max_wait_ms: float = 2.0,
                 max_inflight: int = 2):
        self.pipeline = pipeline
        # pipeline emits an extra in-graph binarization plane?
        self._has_hard = getattr(pipeline, "hard_threshold",
                                 None) is not None
        self.batch = int(batch)
        self.max_wait = max_wait_ms / 1000.0
        self.q: "queue.Queue[_Request]" = queue.Queue()
        # bounded: backpressure instead of unbounded device-buffer growth
        self._inflight: "queue.Queue" = queue.Queue(maxsize=max_inflight)
        self.stats = {"dispatches": 0, "frames": 0, "errors": 0}
        self._stop = threading.Event()
        self._dispatch_dead = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._completer = threading.Thread(target=self._complete_loop,
                                           daemon=True)
        self._thread.start()
        self._completer.start()

    def submit(self, frame: np.ndarray, timeout: float = 30.0) -> _Request:
        frame = np.asarray(frame)
        if frame.shape != (64, 64, 3):
            # reject here, per-request — a bad shape reaching the
            # batch-fill loop would be a batch-level failure at best
            raise ValueError(
                f"expected frame shape (64, 64, 3), got {frame.shape}")
        req = _Request(frame=frame.astype(np.uint8, copy=False))
        self.q.put(req)
        if not req.done.wait(timeout):
            # mark it so the dispatch thread stops spending device
            # batches on frames nobody will read — under sustained
            # overload every queued-then-503'd request would otherwise
            # still cost a full padded dispatch
            req.abandoned = True
            raise ServerError("inference timed out")
        if req.error is not None:
            raise ServerError(req.error)
        return req

    def close(self) -> None:
        self._stop.set()
        self._thread.join(timeout=5)
        # _dispatch_dead is set by the dispatch thread's own finally
        # (the only ordering that guarantees every _inflight.put
        # happened-before): a wedged-then-recovering dispatch still
        # releases the completer when it actually exits, instead of
        # leaking a forever-polling thread
        self._completer.join(timeout=5)
        # fail whatever was queued but never drained
        while True:
            try:
                req = self.q.get_nowait()
            except queue.Empty:
                break
            req.error = "server shutting down"
            req.done.set()

    def _drain(self) -> list:
        """Block for one request, then collect more until the batch is
        full or max_wait has elapsed since the first arrival.
        Abandoned requests (submit() already timed out and 503'd the
        client) are dropped here instead of wasting dispatch slots."""
        try:
            first = self.q.get(timeout=0.1)
        except queue.Empty:
            return []
        reqs = [] if first.abandoned else [first]
        deadline = time.monotonic() + self.max_wait
        while len(reqs) < self.batch:
            left = deadline - time.monotonic()
            if left <= 0:
                break
            try:
                req = self.q.get(timeout=left)
            except queue.Empty:
                break
            if not req.abandoned:
                reqs.append(req)
        return reqs

    @staticmethod
    def _fail(reqs, exc, stats) -> None:
        stats["errors"] += 1
        msg = f"{type(exc).__name__}: {exc}"
        print(f"[cgs-tpu serve] batch failed: {msg}")
        for r in reqs:
            r.error = msg
            r.done.set()

    def _loop(self) -> None:
        try:
            self._loop_body()
        finally:
            self._dispatch_dead.set()

    def _loop_body(self) -> None:
        while not self._stop.is_set():
            reqs = self._drain()
            if not reqs:
                continue
            try:
                # the fill loop lives INSIDE the guard: any surprise
                # here (shape drift despite the submit() check, a
                # non-array frame) must fail the batch, not kill the
                # dispatch thread and zombie the whole server
                frames = np.zeros((self.batch, 64, 64, 3), np.uint8)
                for i, r in enumerate(reqs):
                    frames[i] = r.frame
                # async dispatch: returns device futures immediately
                out = self.pipeline.run_device(
                    self.pipeline.place_input(frames))
            except Exception as e:      # keep the thread alive —
                self._fail(reqs, e, self.stats)  # fail the batch only
                continue
            self.stats["dispatches"] += 1
            self.stats["frames"] += len(reqs)
            self._inflight.put((reqs, out))   # blocks at max_inflight

    def _complete_loop(self) -> None:
        while not (self._dispatch_dead.is_set()
                   and self._inflight.empty()):
            try:
                reqs, out = self._inflight.get(timeout=0.1)
            except queue.Empty:
                continue
            try:
                # D2H readback — async dispatch errors surface HERE
                pred, mask = np.asarray(out[0]), np.asarray(out[1])
                hard = np.asarray(out[3]) if self._has_hard else None
            except Exception as e:
                self._fail(reqs, e, self.stats)
                continue
            for i, r in enumerate(reqs):
                r.mask = mask[i, :, :, 0]
                if hard is not None:
                    r.hard = hard[i, :, :, 0]
                r.pred = float(pred[i])
                r.done.set()


class MaskServer:
    """Checkpointed models + micro-batcher + HTTP front."""

    def __init__(self, cfg: Config, crf_fn=None):
        import jax.numpy as jnp

        from cgs_tpu.models.critic import Critic
        from cgs_tpu.models.decoder import UnetDecoder
        from cgs_tpu.pipeline import MaskPipeline
        from cgs_tpu.train.checkpoints import load_model_pt

        self.cfg = cfg
        cdt = jnp.bfloat16 if cfg.bf16 else jnp.float32
        critic = Critic(bottleneck=cfg.neck, chfak=cfg.chfak,
                        dropout=cfg.dropout, compute_dtype=cdt)
        masker = UnetDecoder(bottleneck=cfg.neck, chfak=cfg.chfak,
                             compute_dtype=cdt)
        ensemble = cfg.ensemble > 0
        if ensemble:
            # --ensemble N: serve the mean mask of the N per-seed
            # runs {model}-seed{s} (same semantics as -process);
            # members must exist — a silently random member would
            # corrupt every served mask. On a mesh with
            # N % n_data == 0 the pipeline runs seed-sharded
            # (seed-per-device shard_map, pipeline.py); otherwise
            # unmeshed (GSPMD would miscompile the vmapped forward,
            # see sandbox/seed_parallel.py).
            from cgs_tpu.parallel.mesh import (
                ensemble_mesh_or_none, local_mesh_or_none,
            )
            from cgs_tpu.train.checkpoints import load_seed_ensemble
            params = load_seed_ensemble(cfg, cfg.ensemble)
            mesh = ensemble_mesh_or_none(local_mesh_or_none(cfg),
                                         cfg.ensemble, "cgs-tpu serve")
        else:
            params = self._load_params(cfg, critic, masker,
                                       load_model_pt)
            from cgs_tpu.parallel.mesh import local_mesh_or_none
            # --data-parallel N: shard each micro-batch dispatch over
            # a DP mesh (multi-chip serving; parallel/mesh.py) — the
            # pipeline pads the batch to a multiple of the mesh width
            mesh = local_mesh_or_none(cfg)
        batch = cfg.infer_batch or 256
        # separate=cfg.separate: a `-separate` run's masker was
        # trained on the sepcrit's embeds (main.py:946-947) — serving
        # must feed it the same features or /segment silently returns
        # different masks than the offline -process path
        # --serve-wire u8: D2H the PNG-space quantized uint8 mask (1/4
        # the transfer — serve responses are 8-bit PNGs, so `raw` is
        # bit-identical) plus, with --binarymaskthreshold, the
        # in-graph binarization plane for `thresholded` at the
        # server's threshold. The f32 default keeps per-request custom
        # thresholds and -crf exact (those need the f32 probabilities,
        # so under u8 they are rejected with 400).
        self.wire = getattr(cfg, "serve_wire", "f32")
        self.hard_thr = (float(cfg.binarymaskthreshold)
                         if self.wire == "u8" and cfg.binarymaskthreshold
                         else None)
        if self.wire == "u8" and cfg.crf:
            raise ValueError(
                "--serve-wire u8 is incompatible with --crf: CRF "
                "refinement consumes f32 soft-mask probabilities")
        pipe = MaskPipeline(critic, masker, params, batch_size=batch,
                            eval_mode=not cfg.noevalmode, seed=cfg.seed,
                            separate=cfg.separate and not ensemble,
                            mesh=mesh, ensemble=ensemble,
                            wire=self.wire, hard_threshold=self.hard_thr)
        batch = pipe.batch      # mesh-rounded
        # warm the (single, batch-shaped) compiled program before
        # accepting traffic — the batcher always dispatches full pads
        warm = pipe.run_device(pipe.place_input(
            np.zeros((batch, 64, 64, 3), np.uint8)))
        np.asarray(warm[1])
        self.pipe = pipe
        self.batcher = MicroBatcher(pipe, batch,
                                    max_wait_ms=cfg.serve_wait_ms)
        self.crf_fn = crf_fn
        self.httpd: Optional[ThreadingHTTPServer] = None
        self._reload_lock = threading.Lock()
        self.reloads = 0

    @staticmethod
    def _load_params(cfg, critic, masker, load_model_pt):
        """Fingerprinted .pt checkpoints from the run dir (the shared
        checkpoint_paths scheme Handler saves under); random init where
        missing (useful for smoke tests, loudly reported). Init runs on
        the host CPU backend like Handler.reset_models — remote-compiling
        the tiny init programs through a TPU tunnel costs ~45 s for
        nothing."""
        import jax

        from cgs_tpu.train.checkpoints import checkpoint_paths

        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            x0 = np.zeros((1, 64, 64, 3), np.float32)
            k1, k2, k3 = jax.random.split(
                jax.random.PRNGKey(cfg.seed), 3)
            cp = critic.init({"params": k1}, x0, collect=True)["params"]
            _, em = critic.apply({"params": cp}, x0, collect=True)
            mp = masker.init({"params": k2}, x0, em)["params"]
            params = {"critic": cp, "masker": mp}
            if cfg.separate:
                params["sepcrit"] = critic.init(
                    {"params": k3}, x0, collect=True)["params"]
        paths = {name: path
                 for name, path in checkpoint_paths(cfg).items()
                 if name in params}
        for name, path in paths.items():
            loaded = load_model_pt(name, path)
            if loaded is None:
                print(f"[cgs-tpu serve] {path} not found — "
                      f"serving a RANDOM {name}")
            else:
                print(f"[cgs-tpu serve] loaded {path}")
                params[name] = loaded
        return params

    def reload_checkpoints(self) -> dict:
        """Zero-downtime model update: re-read the fingerprinted .pt
        checkpoints from the run dir and hot-swap them into the live
        pipeline. Serves the continuous-training deployment loop
        (Handler keeps overwriting the same fingerprinted filenames
        every --saveevery epochs, main.py:228,565 — a co-located
        server picks the new weights up without dropping traffic).

        Missing files keep the CURRENTLY SERVED sub-tree (unlike
        startup, which falls back to random init) — a reload must
        never degrade a live model. The swap itself is
        MaskPipeline.update_params: a single attribute assignment,
        atomic under the GIL; in-flight dispatches finish on the old
        tree, the next dispatch picks up the new one. Returns
        {model name: loaded bool}."""
        from cgs_tpu.train.checkpoints import checkpoint_paths, load_model_pt

        if self.cfg.ensemble > 0:
            # all-or-nothing for ensembles: a partially refreshed
            # member set would mix training generations in one mean.
            # Exception (not just FileNotFoundError): a member .pt
            # mid-overwrite can raise Unpickling/EOF errors — the
            # reload contract is keep-served-weights, never 500
            from cgs_tpu.train.checkpoints import load_seed_ensemble
            with self._reload_lock:
                try:
                    params = load_seed_ensemble(self.cfg,
                                                self.cfg.ensemble)
                except Exception as e:
                    print(f"[cgs-tpu serve] ensemble reload skipped: "
                          f"{type(e).__name__}: {e} — keeping served "
                          "weights")
                    return {"ensemble": False}
                self.pipe.update_params(params)
                self.reloads += 1
                print(f"[cgs-tpu serve] reloaded ensemble of "
                      f"{self.cfg.ensemble}")
                return {"ensemble": True}

        with self._reload_lock:
            params = dict(self.pipe.params)
            loaded = {}
            for name, path in checkpoint_paths(self.cfg).items():
                if name not in params:
                    continue
                try:
                    new = load_model_pt(name, path)
                except Exception as e:
                    # per-model isolation: one unreadable file (e.g. a
                    # corrupt write) must not discard the sub-trees
                    # already read or fail the whole reload with 500
                    print(f"[cgs-tpu serve] reload {name}: "
                          f"{type(e).__name__}: {e} — keeping served "
                          "weights")
                    loaded[name] = False
                    continue
                loaded[name] = new is not None
                if new is not None:
                    params[name] = new
            if any(loaded.values()):
                self.pipe.update_params(params)
                self.reloads += 1
                ok = sorted(n for n, got in loaded.items() if got)
                print(f"[cgs-tpu serve] reloaded {ok}")
            return loaded

    # -- request handling -------------------------------------------

    def segment_bytes(self, body: bytes, variant: str = "raw",
                      threshold: float = 0.5,
                      resize: bool = False) -> bytes:
        """image bytes -> PNG mask bytes (the HTTP-free core, also the
        unit-test surface)."""
        from PIL import Image

        img = Image.open(io.BytesIO(body)).convert("RGB")
        w, h = img.size
        if (w, h) != (64, 64):
            if not resize:
                raise ValueError(
                    f"expected 64x64 input, got {w}x{h} "
                    "(pass ?resize=1 to auto-resize)")
            img = img.resize((64, 64), Image.BILINEAR)
        frame = np.asarray(img, np.uint8)
        req = self.batcher.submit(frame)
        mask = req.mask
        if self.wire == "u8":
            # quantized wire: mask is already the PNG payload
            if variant == "crf":
                raise ValueError(
                    "crf variant needs f32 soft masks — restart the "
                    "server without --serve-wire u8")
            if variant == "thresholded":
                if req.hard is None:
                    raise ValueError(
                        "thresholded variant under --serve-wire u8 "
                        "needs --binarymaskthreshold set at server "
                        "start (the binarization runs in-graph)")
                if abs(threshold - self.hard_thr) > 1e-12:
                    raise ValueError(
                        f"--serve-wire u8 binarizes in-graph at the "
                        f"server threshold {self.hard_thr}; "
                        f"per-request ?threshold={threshold} is only "
                        "available on the f32 wire")
                png_mask = req.hard * np.uint8(255)
            else:
                png_mask = mask
            out = Image.fromarray(png_mask, "L")
        else:
            if variant == "crf":
                if self.crf_fn is None:
                    raise ValueError("server started without --crf")
                refined = self.crf_fn(frame[None], mask[None])
                mask = np.asarray(refined)[0].astype(np.float32)
            elif variant == "thresholded":
                # >= to match the offline -process binarization
                # (eval/segment.py: masks >= binarymaskthreshold)
                mask = (mask >= threshold).astype(np.float32)
            out = Image.fromarray(
                (np.clip(mask, 0, 1) * 255).astype(np.uint8), "L")
        if (w, h) != (64, 64):
            out = out.resize((w, h), Image.NEAREST)
        buf = io.BytesIO()
        out.save(buf, format="PNG")
        return buf.getvalue()

    # -- HTTP front --------------------------------------------------

    def make_handler(self):
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):   # quiet access log
                pass

            def _json(self, code: int, payload: dict):
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                path = urlparse(self.path).path
                if path in ("/healthz", "/stats"):
                    dead = server.batcher._dispatch_dead.is_set()
                    self._json(503 if dead else 200,
                               {"status": "dead" if dead else "ok",
                                **server.batcher.stats,
                                "batch": server.batcher.batch,
                                "reloads": server.reloads})
                else:
                    self._json(404, {"error": "not found"})

            def do_POST(self):
                url = urlparse(self.path)
                if url.path == "/reload":
                    try:
                        loaded = server.reload_checkpoints()
                    except Exception as e:
                        self._json(500, {"error": f"{type(e).__name__}"
                                                  f": {e}"})
                        return
                    self._json(200, {"reloaded": loaded,
                                     "reloads": server.reloads})
                    return
                if url.path != "/segment":
                    self._json(404, {"error": "not found"})
                    return
                qs = parse_qs(url.query)
                variant = qs.get("variant", ["raw"])[0]
                if variant not in VARIANTS:
                    self._json(400, {"error": f"variant must be one "
                                              f"of {VARIANTS}"})
                    return
                try:
                    threshold = float(
                        qs.get("threshold",
                               [str(server.cfg.binarymaskthreshold)])[0])
                    n = int(self.headers.get("Content-Length", 0))
                    png = server.segment_bytes(
                        self.rfile.read(n), variant=variant,
                        threshold=threshold,
                        resize=qs.get("resize", ["0"])[0] == "1")
                except ServerError as e:     # device failure/overload
                    self._json(503, {"error": str(e)})
                    return
                except (ValueError, OSError) as e:
                    # OSError covers PIL.UnidentifiedImageError on
                    # malformed/empty bodies
                    self._json(400, {"error": str(e)})
                    return
                except Exception as e:       # e.g. CRF RuntimeError —
                    # a dropped connection is worse than any status
                    self._json(500, {"error": f"{type(e).__name__}: "
                                              f"{e}"})
                    return
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.send_header("Content-Length", str(len(png)))
                self.end_headers()
                self.wfile.write(png)

        return Handler

    def start(self, host: str = "127.0.0.1", port: int = 8700):
        self.httpd = _Server((host, port), self.make_handler())
        return self.httpd

    def serve_forever(self, host: str = "127.0.0.1", port: int = 8700):
        httpd = self.start(host, port)
        print(f"[cgs-tpu serve] listening on http://{host}:{port} "
              f"(batch {self.batcher.batch}, "
              f"wait {self.batcher.max_wait * 1000:.0f} ms)")
        try:
            httpd.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            self.shutdown()

    def shutdown(self):
        if self.httpd is not None:
            self.httpd.shutdown()
            self.httpd.server_close()
            self.httpd = None
        self.batcher.close()


def main(argv=None):
    import argparse

    extra = argparse.ArgumentParser(add_help=False)
    extra.add_argument("--port", type=int, default=8700)
    extra.add_argument("--host", type=str, default="127.0.0.1")
    extra_ns, rest = extra.parse_known_args(argv)
    cfg = parse_args(rest)
    crf_fn = None
    if cfg.crf:
        from cgs_tpu.eval.crf import DenseCRF
        crf_fn = DenseCRF(rescale=cfg.crf_rescale)
    MaskServer(cfg, crf_fn=crf_fn).serve_forever(
        host=extra_ns.host, port=extra_ns.port)


if __name__ == "__main__":
    main()
