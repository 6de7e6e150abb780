"""Benchmark harness for the BASELINE.json configs.

Default (headline): 4x RRDB (ESRGAN, nb=23 nf=64) 1080p -> 4K tiled upscale,
bf16, on whatever JAX platform is active (real TPU chip under the driver).
Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Other configs via --model:
  srresnet  — SRGAN 4x single-image (no tiling) upscale
  chain     — 1x ESRGAN denoise -> 4x ESRGAN + device color-fix
  unet      — pix2pix UNet-256 image-to-image (batch of 256x256)
  cyclegan  — CycleGAN ResNet-9 tiled image-to-image
  ppon      — PPON 4x tiled (3-branch, output index 2)
  wbc       — WBC cartoonization + guided filter
  pan       — PAN 4x tiled (pixel attention, self-attention FSA)

The metric is output megapixels per second per chip; the BASELINE.json
north-star target (vs_baseline=1.0) is 20 MP/s for the headline config.

Outage resilience: the tunneled TPU backend can go UNAVAILABLE (or hang a
trivial op for minutes) — it erased round 3's headline artifact.  The
default entry point is therefore a SUPERVISOR that (1) liveness-probes the
backend in a time-bounded subprocess, (2) runs the actual measurement in a
time-bounded worker subprocess, (3) retries with backoff across a window,
and (4) on persistent outage emits the last-known-good measurement for the
same config annotated with "outage": true — always one parseable JSON line.
Last-good lines live in tools/out/bench_last_good_<model>.json (committed).
Run the measurement directly (old behavior) with --no-supervise.
"""
from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import subprocess
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

_REPO = osp.dirname(osp.abspath(__file__))


def _last_good_path(model: str) -> str:
    """Per-config last-good file: the bare model name for a default
    (driver) invocation, model+hash for any non-default flag set, so e.g.
    a --tile-mode hybrid run never overwrites the headline's record."""
    base = os.environ.get("INNFER_BENCH_LASTGOOD_DIR",
                          osp.join(_REPO, "tools", "out"))
    extra = [a for a in sys.argv[1:] if a not in ("--model", model)]
    if extra:
        import hashlib

        h = hashlib.md5(" ".join(extra).encode()).hexdigest()[:8]
        return osp.join(base, f"bench_last_good_{model}_{h}.json")
    return osp.join(base, f"bench_last_good_{model}.json")


def _probe_backend(timeout_s: float) -> bool:
    """True iff a trivial jitted reduction completes within timeout_s.

    Runs in a subprocess: when the tunnel is dead the op HANGS in-process
    (observed >21 min in round 3), so an in-process probe can't be bounded.
    """
    cmd = os.environ.get("INNFER_BENCH_PROBE_CMD")
    if cmd is None:
        cmd = (sys.executable + " -c \"import jax, jax.numpy as jnp; "
               "print(float(jax.jit(lambda t: jnp.sum(t))"
               "(jnp.ones((256, 256), jnp.bfloat16))))\"")
    try:
        r = subprocess.run(cmd, shell=True, timeout=timeout_s,
                           capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _run_worker(timeout_s: float) -> tuple[dict | None, str]:
    """Run the real measurement in a subprocess; parse its last stdout line.

    Returns (result, reason); reason distinguishes a hang ("timeout", the
    round-3 outage signature) from a crash ("crash"/"nojson", a likely
    code regression when the backend probe stays live)."""
    cmd = os.environ.get("INNFER_BENCH_WORKER_CMD")
    if cmd is None:
        argv = [sys.executable, osp.abspath(__file__), "--no-supervise",
                *sys.argv[1:]]
    else:
        argv = cmd  # test harness override (shell string)
    try:
        r = subprocess.run(argv, shell=isinstance(argv, str),
                           timeout=timeout_s, capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        print("bench: worker timed out", file=sys.stderr)
        return None, "timeout"
    if r.returncode != 0:
        print(f"bench: worker rc={r.returncode}\n{r.stderr[-2000:]}",
              file=sys.stderr)
        return None, "crash"
    for line in reversed(r.stdout.strip().splitlines()):
        try:
            d = json.loads(line)
            if isinstance(d, dict) and "value" in d:
                return d, "ok"
        except ValueError:
            continue
    print("bench: worker produced no JSON line", file=sys.stderr)
    return None, "nojson"


def supervise(model: str) -> int:
    """Probe -> run (xN, median) -> retry-with-backoff -> last-good fallback.

    Always prints exactly one JSON line on stdout.  Exit 1 in two cases
    (exit 0 otherwise): (a) persistent outage AND no last-good recorded,
    (b) N consecutive worker crashes under a live backend probe (a likely
    code regression — a stale last-good line, if any, is still printed but
    marked "worker_failed" and must not pass as a healthy capture).

    MEDIAN PROTOCOL (VERDICT r4 weak #1): the backend swings +-25-50%
    between time windows, so a single capture of a 0.7%-margin headline is
    not stability evidence.  The headline config (plain ``--model esrgan``,
    the driver invocation) defaults to the median of 3 supervised captures
    (low-median: the reported line IS one real capture); every capture's
    value is recorded in "samples".  Override with INNFER_BENCH_MEDIAN=N
    (and INNFER_BENCH_MEDIAN_GAP_S to space captures across windows).  If
    the retry window or a worker regression cuts the run short after >=1
    success, the median of the collected samples is reported (the partial
    "samples" list makes that visible).
    """
    probe_to = float(os.environ.get("INNFER_BENCH_PROBE_TIMEOUT", "120"))
    run_to = float(os.environ.get("INNFER_BENCH_RUN_TIMEOUT", "1800"))
    window = float(os.environ.get("INNFER_BENCH_RETRY_S", "1200"))
    t0 = time.time()
    backoff = float(os.environ.get("INNFER_BENCH_BACKOFF_S", "20"))
    max_live_fails = int(os.environ.get("INNFER_BENCH_MAX_WORKER_FAILS", "3"))
    extra = [a for a in sys.argv[1:] if a not in ("--model", model)]
    median_n = int(os.environ.get(
        "INNFER_BENCH_MEDIAN",
        "3" if model == "esrgan" and not extra else "1"))
    gap = float(os.environ.get("INNFER_BENCH_MEDIAN_GAP_S", "0"))
    attempt = 0
    live_fails = 0  # consecutive worker failures WITH a live backend probe
    successes = []
    while True:
        attempt += 1
        alive = _probe_backend(probe_to)
        if alive:
            result, reason = _run_worker(run_to)
            if result is not None:
                successes.append(result)
                live_fails = 0
                if len(successes) >= median_n:
                    break
                if gap:
                    time.sleep(gap)
                continue
            # a CRASHED worker under a LIVE probe is ambiguous on this
            # backend (the probe's tiny executable is compile-cached, so
            # a dead remote-compile helper can pass it while the real
            # graph 500s) — but N consecutive crashes mean a code
            # regression, which a stale last-good line must NOT mask as
            # a healthy capture.  A worker TIMEOUT is the round-3 outage
            # signature (mid-graph hang) and keeps the retry loop.
            if reason in ("crash", "nojson"):
                live_fails += 1
                if live_fails >= max_live_fails:
                    break
            else:  # timeout IS outage evidence — reset like a dead probe
                live_fails = 0
        else:
            live_fails = 0  # outage evidence — reset the crash counter
            print(f"bench: backend probe failed (attempt {attempt})",
                  file=sys.stderr)
        if time.time() - t0 + backoff > window:
            break
        time.sleep(backoff)
        backoff = min(backoff * 2, 300.0)
    if successes:
        vals = [s["value"] for s in successes]
        # low-median: the reported line is one REAL capture, not an average
        result = dict(sorted(successes,
                             key=lambda s: s["value"])[(len(vals) - 1) // 2])
        if median_n > 1:
            result["samples"] = vals
        result["captured_at"] = time.strftime(
            "%Y-%m-%dT%H:%M:%SZ", time.gmtime())
        try:
            os.makedirs(osp.dirname(_last_good_path(model)), exist_ok=True)
            with open(_last_good_path(model), "w") as f:
                json.dump({"argv": sys.argv[1:], **result}, f)
                f.write("\n")
        except OSError:
            pass
        line = {k: v for k, v in result.items() if k != "captured_at"}
        print(json.dumps(line))
        return 0
    # Any unresolved crash evidence at exit counts: a slow-crashing
    # regression that burns the retry window in <max_live_fails attempts
    # must not be laundered into a soft-healthy "outage" line.
    worker_broken = live_fails > 0
    # persistent outage (or broken worker): emit last-known-good, marked
    try:
        with open(_last_good_path(model)) as f:
            lg = json.load(f)
        out = {k: lg[k] for k in ("metric", "value", "unit", "vs_baseline",
                                  "samples")
               if k in lg}
        out["last_good_at"] = lg.get("captured_at", "unknown")
        if worker_broken:
            out["worker_failed"] = True
            print(json.dumps(out))
            return 1
        out["outage"] = True
        print(json.dumps(out))
        return 0
    except (OSError, ValueError, KeyError):
        print(json.dumps({
            "metric": f"bench {model} ("
                      + ("worker failed with live backend"
                         if worker_broken else "backend outage")
                      + ", no last-good)",
            "value": 0.0, "unit": "MP/s", "vs_baseline": 0.0,
            "outage": not worker_broken, "worker_failed": worker_broken}))
        return 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-supervise", action="store_true",
                    help="run the measurement in-process (no probe/retry/"
                         "fallback; used internally by the supervisor)")
    ap.add_argument("--model", default="esrgan",
                    choices=["esrgan", "srresnet", "chain", "unet", "cyclegan",
                             "ppon", "wbc", "pan", "esrgan_e2e", "pan_e2e"])
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--nb", type=int, default=23)
    ap.add_argument("--nf", type=int, default=64)
    ap.add_argument("--scale", type=int, default=4)
    # "256" (square) or "1088x256" (rect, uniform mode strip plans)
    ap.add_argument("--tile", type=str, default="256")
    ap.add_argument("--overlap", type=int, default=16)
    ap.add_argument("--tile-batch", type=int, default=8)
    ap.add_argument("--tile-mode",
                    choices=["auto", "uniform", "reference", "hybrid", "none"],
                    default="auto")
    ap.add_argument("--max-group-px", type=int, default=1_400_000)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--warmup", type=int, default=1)
    ap.add_argument("--dtype", choices=["bf16", "fp32"], default="bf16")
    ap.add_argument("--batch", type=int, default=0,
                    help="image batch: stacked whole-image forwards for "
                         "the untiled configs, cross-image tile stacking "
                         "for the tiled ones; 0 = config default.  See "
                         "tools/out/batch_ab.json, tile_stack_ab.json.")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--profile", type=str, default="")
    args = ap.parse_args()

    if not args.no_supervise and not args.cpu:
        sys.exit(supervise(args.model))

    if "x" in args.tile:
        th, tw = args.tile.split("x")
        args.tile = (int(th), int(tw))
    else:
        args.tile = int(args.tile)
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from innfer_tpu.observability import enable_compilation_cache

    enable_compilation_cache()

    from innfer_tpu.ops.filters import guided_filter
    from innfer_tpu.tiling.engine import TiledRunner
    from tools import synth_params as SP

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    checksum = jax.jit(lambda t: jnp.sum(t.astype(jnp.float32)))

    def sync(out):
        return float(checksum(out))

    # Drop-proof chained timing (CLAUDE.md methodology): iteration k+1's
    # input carries a runtime-scalar dependency on iteration k's output,
    # so no dispatch can be dropped and ONE final fetch syncs the whole
    # run.  (Fetching a device scalar costs ~30 ms/call on this tunneled
    # backend even with a persistent checksum executable — a per-
    # iteration sync taxed the headline step ~1.8%.)  The epsilon is a
    # runtime value, so XLA cannot fold the add away; in bf16/fp32 it is
    # below the input's rounding ulp.
    chain_dep = jax.jit(
        lambda x, out: x + (out.ravel()[0] * 1e-30).astype(x.dtype))

    rng = np.random.default_rng(0)

    def tiled(model, params, h, w, **kw):
        if args.tile_mode == "none":
            # whole-image forward: probes the per-op/dispatch floor that
            # binds small-spatial tiled configs (cyclegan/ppon; VERDICT r3).
            # --batch stacks N images (batched directory mode's compute
            # core; tools/out/batch_ab.json)
            nb = args.batch or 1
            x = jnp.asarray(rng.random((nb, h, w, 3), np.float32), dtype)

            def fwd(p, t):
                out = model.apply(p, t)
                if model.output_index is not None:
                    out = out[model.output_index]
                return out

            jfwd = jax.jit(fwd)
            return ((lambda t: jfwd(params, t)), x,
                    nb * h * w * model.scale ** 2 / 1e6)
        runner = TiledRunner(
            model.apply, model.scale, mode=args.tile_mode, tile=args.tile,
            overlap=args.overlap, tile_batch=args.tile_batch,
            output_index=model.output_index, compute_dtype=dtype,
            max_group_px=args.max_group_px,
            tile_quantum=model.tile_quantum,
            tile_quantum_strict=model.tile_quantum_strict,
            trunk_fn=model.apply_trunk, tail_fn=model.apply_tail,
            tail_halo=model.tail_halo, **kw)
        # --batch N stacks N images through the tiled engine: cross-image
        # tile stacking shares dispatch groups (engine.tiled_apply)
        nb = args.batch or 1
        x = jnp.asarray(rng.random((nb, h, w, 3), np.float32), dtype)
        return ((lambda t: runner(params, t)), x,
                nb * h * w * model.scale ** 2 / 1e6)

    h, w = args.height, args.width

    if args.model.endswith("_e2e"):
        # I/O-INCLUSIVE product path (VERDICT r4 #1): real PNGs on disk ->
        # InferenceSession.process() -> PNGs on disk.  Times the
        # user-visible directory loop (native prefetch decode,
        # tiled/hybrid device step, background PNG-encode pool) instead
        # of the device step on synthetic arrays.  Every output is
        # fetched to host and written, so no dispatch can be dropped
        # (the chained-timing methodology is unnecessary here).
        # Matches ref run.py:404-442 (the per-image product loop).
        import tempfile

        from innfer_tpu.checkpoint.writer import write_checkpoint
        from innfer_tpu.io import images as iio
        from innfer_tpu.pipeline import InferenceSession

        fam = args.model[: -len("_e2e")]
        n_imgs = int(os.environ.get("INNFER_E2E_IMGS", "8"))
        tmp_ctx = tempfile.TemporaryDirectory(prefix="innfer_e2e_")
        tmp = tmp_ctx.name
        ckpt = osp.join(tmp, f"{args.scale}x_{fam}.pth")
        if fam == "esrgan":
            write_checkpoint(ckpt, SP.esrgan_state(
                scale=args.scale, nb=args.nb, nf=args.nf))
        else:
            write_checkpoint(ckpt, SP.pan_state(scale=args.scale))
        inp, outp = osp.join(tmp, "in"), osp.join(tmp, "out")
        os.makedirs(inp)
        # realistic compressibility: smooth structure + mild noise (pure
        # noise makes PNG encode pathologically slow, flat fields make it
        # free; either would bias the encode-overlap measurement)
        yy, xx = np.mgrid[0:h, 0:w]
        base = 127 + 90 * np.sin(xx / 37.0) * np.cos(yy / 23.0)
        for i in range(n_imgs):
            img = np.clip(
                base[..., None] + rng.normal(0, 12, (h, w, 3))
                + 20 * np.sin((xx + 57 * i) / 11.0)[..., None], 0, 255)
            iio.save_img(img.astype(np.uint8), osp.join(inp, f"i{i:03d}.png"))
        from innfer_tpu.observability import StageTimers

        sess = InferenceSession(
            ckpt, compute_dtype=dtype, tile=args.tile, overlap=args.overlap,
            tile_mode=args.tile_mode, tile_batch=args.tile_batch)
        batch = args.batch or 1
        sess.process(inp, outp, verbose=False, batch=batch)  # compile pass
        timers = StageTimers()
        t0 = time.perf_counter()
        for _ in range(args.iters):
            sess.process(inp, outp, verbose=False, batch=batch,
                         timers=timers)
        dt = time.perf_counter() - t0
        mps = n_imgs * args.iters * h * w * args.scale ** 2 / 1e6 / dt
        # stage attribution: "image"/"batch" is DISPATCH only (async);
        # "fetch" (pool) carries device execution + device->host transfer;
        # "encode"/"read" are host codec time.  Totals overlap in wall
        # time — they diagnose the bottleneck, they don't sum to dt.
        stages = {k: v["total_s"] for k, v in timers.report().items()}
        result = {
            "metric": (f"END-TO-END output megapixels/sec/chip incl. disk "
                       f"read + PNG encode, {args.scale}x {fam} {h}x{w} "
                       f"x{n_imgs} images"
                       + (f" batch {batch}" if batch > 1 else "")
                       + f", {args.dtype}"),
            "value": round(mps, 3),
            "unit": "MP/s",
            "vs_baseline": round(mps / 20.0, 3),
            "wall_s": round(dt, 2),
            "stages": stages,
        }
        if stages.get("fetch"):
            # implied device->host link rate for the u8 outputs: e2e is
            # TUNNEL-bound on this backend (BASELINE.md), so this one
            # number says whether a capture landed in a degraded window
            # (healthy parallel-fetch rate is ~35-40 MB/s — link_probe)
            out_mb = n_imgs * args.iters * h * w * args.scale ** 2 * 3 / 1e6
            result["fetch_mb_s"] = round(out_mb / stages["fetch"], 1)
        print(json.dumps(result))
        return

    how = "whole-image" if args.tile_mode == "none" else "tiled"
    if args.batch > 1:
        how += f" batch {args.batch}"
    if args.model == "esrgan":
        model, params = SP.build("esrgan", scale=args.scale, dtype=dtype,
                                 nb=args.nb, nf=args.nf)
        step, x0, out_mp = tiled(model, params, h, w)
        desc = f"{args.scale}x RRDB(nb={args.nb}, nf={args.nf}) {h}x{w} {how}"
    elif args.model == "srresnet":
        model, params = SP.build("srresnet", scale=args.scale, dtype=dtype,
                                 nb=16, nf=64)
        # whole-image (reference no-chop path); 4x at 1080p overflows the
        # 16GB HBM (pixelshuffle intermediates at 4320p), so cap at 720p
        hh, ww = min(h, 720), min(w, 1280)
        hh, ww = (hh // 8) * 8, (ww // 8) * 8
        x0 = jnp.asarray(rng.random((1, hh, ww, 3), np.float32), dtype)
        fwd = jax.jit(model.apply)
        step = lambda t: fwd(params, t)
        out_mp = hh * ww * args.scale ** 2 / 1e6
        desc = f"{args.scale}x SRResNet {hh}x{ww} whole-image"
    elif args.model == "chain":
        # PRODUCT path (VERDICT r2 #2): a real InferenceSession built from
        # real checkpoint files, chained `1x+4x`.  Since round 5 the
        # product default is SEQUENTIAL stage-by-stage (each stage rides
        # the hybrid whole-image-trunk upgrade; measured 9.07 vs fused
        # 6.2-7.5 MP/s same-window — tools/out/chain_product_ab.json).
        # The step includes the full user-visible cost: host->device
        # upload, both tiled/hybrid stages, device color-fix,
        # device->host download.
        import tempfile

        from innfer_tpu.checkpoint.writer import write_checkpoint
        from innfer_tpu.ops.filters import color_fix
        from innfer_tpu.pipeline import InferenceSession, np2tensor

        tmp_ctx = tempfile.TemporaryDirectory(prefix="innfer_bench_")
        tmp = tmp_ctx.name  # cleaned up at interpreter exit
        c1 = osp.join(tmp, "1x_denoise.pth")
        c2 = osp.join(tmp, "4x_up.pth")
        write_checkpoint(c1, SP.esrgan_state(scale=1, nb=args.nb, nf=args.nf))
        write_checkpoint(c2, SP.esrgan_state(scale=4, nb=args.nb, nf=args.nf,
                                             seed=1))
        sess = InferenceSession(
            c1 + "+" + c2, compute_dtype=dtype, tile=args.tile,
            overlap=args.overlap, tile_mode=args.tile_mode,
            tile_batch=args.tile_batch)
        assert sess._fused_runner is None  # sequential product default
        hh, ww = h // 2, w // 2  # keep chain runtime reasonable
        img = (rng.random((hh, ww, 3)) * 255).astype(np.uint8)
        x0 = np2tensor(img, dtype=dtype)
        cf = jax.jit(lambda a, b: color_fix(a * 255.0, b * 255.0))

        def step(t):
            out = t
            for st in sess.stages:
                out = st(out)
            return cf(t.astype(jnp.float32), out.astype(jnp.float32))

        out_mp = hh * ww * 16 / 1e6
        desc = (f"chain 1x+4x RRDB {hh}x{ww} tiled "
                "(product sequential path) + color-fix")
    elif args.model == "unet":
        model, params = SP.build("unet", dtype=dtype, num_downs=8, ngf=64)
        batch = args.batch or 8
        x0 = jnp.asarray(rng.random((batch, 256, 256, 3), np.float32) * 2 - 1, dtype)
        fwd = jax.jit(model.apply)
        step = lambda t: fwd(params, t)
        out_mp = batch * 256 * 256 / 1e6
        desc = f"pix2pix UNet-256 batch {batch}"
    elif args.model == "cyclegan":
        model, params = SP.build("cyclegan", dtype=dtype, n_blocks=9, ngf=64)
        step, x0, out_mp = tiled(model, params, h // 2, w // 2)
        desc = f"CycleGAN ResNet-9 {h // 2}x{w // 2} {how}"
    elif args.model == "pan":
        model, params = SP.build("pan", scale=4, dtype=dtype, nb=16)
        step, x0, out_mp = tiled(model, params, h, w)
        desc = f"4x PAN {h}x{w} {how}"
    elif args.model == "ppon":
        model, params = SP.build("ppon", scale=4, dtype=dtype, nb=24)
        step, x0, out_mp = tiled(model, params, h // 2, w // 2)
        desc = f"4x PPON {h // 2}x{w // 2} {how} (perceptual branch)"
    elif args.model == "wbc":
        model, params = SP.build("wbc", dtype=dtype, nf=32)
        batch = args.batch or 1
        x0 = jnp.asarray(rng.random((batch, (h // 4) * 4, (w // 4) * 4, 3),
                                    np.float32) * 2 - 1, dtype)
        fwd = jax.jit(lambda p, t: guided_filter(t, model.apply(p, t), r=1, eps=5e-3))
        step = lambda t: fwd(params, t)
        out_mp = batch * (h // 4) * 4 * (w // 4) * 4 / 1e6
        desc = (f"WBC cartoonization + guided filter {(h // 4) * 4}x{(w // 4) * 4}"
                + (f" batch {batch}" if batch > 1 else ""))

    for _ in range(max(args.warmup, 1)):
        sync(step(x0))
    sync(chain_dep(x0, step(x0)))  # compile the dependency op off the clock

    def timed(n):
        # chained loop, one fetch: each input depends on the previous
        # output, so the final sync transitively forces every dispatch
        # (unfetched INDEPENDENT dispatches can be dropped entirely on
        # this platform, which would inflate throughput by the iteration
        # count — see chain_dep above)
        t0 = time.perf_counter()
        cur, out = x0, None
        for _ in range(n):
            out = step(cur)
            cur = chain_dep(cur, out)
        sync(out)
        return time.perf_counter() - t0

    if args.profile:
        with jax.profiler.trace(args.profile):
            dt = timed(args.iters)
    else:
        dt = timed(args.iters)

    mps = out_mp * args.iters / dt
    print(json.dumps({
        "metric": f"output megapixels/sec/chip, {desc}, {args.dtype}",
        "value": round(mps, 3),
        "unit": "MP/s",
        "vs_baseline": round(mps / 20.0, 3),
    }))


if __name__ == "__main__":
    main()
