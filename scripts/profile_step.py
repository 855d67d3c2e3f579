#!/usr/bin/env python
"""Profile a training step and report where device time goes
(SURVEY.md §5 tracing row, operationalized: this is the workflow that
produced the BASELINE.md step-floor decomposition).

Runs N steps of the chosen stage on synthetic data under
``jax.profiler.trace``, then parses the Perfetto trace and prints the
per-step program time, the top fused-op categories, and the top
individual ops.  The trace itself is left in --logdir for TensorBoard's
profile plugin / Perfetto.

Example:
  python scripts/profile_step.py --mode RtoD --batch_size 128 --steps 3
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def summarize_trace(logdir: str, n_steps: int, top: int = 12):
    """Aggregate device-op durations from the newest trace in logdir.

    Returns (program_ms_per_step, {category: ms}, {op_name: ms}).
    Categories merge XLA fusion-name suffixes (convert_reduce_fusion.123
    -> convert_reduce_fusion), the view round-2 profiling used to find
    the GN-stats step floor.
    """
    traces = sorted(glob.glob(os.path.join(
        logdir, "plugins/profile/*/*.trace.json.gz")))
    if not traces:
        raise FileNotFoundError(f"no trace under {logdir}")
    with gzip.open(traces[-1]) as fh:
        data = json.load(fh)
    names = {e["pid"]: e["args"].get("name") for e in data["traceEvents"]
             if e.get("ph") == "M" and e.get("name") == "process_name"}
    tpu_pids = [p for p, n in names.items()
                if "TPU" in str(n) or "/device:" in str(n)]
    if not tpu_pids:  # CPU runs: fall back to every pid with X events
        tpu_pids = list({e["pid"] for e in data["traceEvents"]
                         if e.get("ph") == "X"})
    cats = collections.defaultdict(float)
    ops = collections.defaultdict(float)
    program = 0.0
    for e in data["traceEvents"]:
        if e.get("ph") != "X" or e["pid"] not in tpu_pids:
            continue
        nm = e.get("name", "?")
        if nm.startswith("jit_"):
            program += e.get("dur", 0)
            continue
        if re.fullmatch(r"\d+", nm):
            # bare-numeric names are XLA region/step markers that span
            # whole groups of ops — counting them double-books time
            continue
        cats[re.sub(r"[.\d]+$", "", nm)] += e.get("dur", 0)
        ops[nm] += e.get("dur", 0)
    to_ms = lambda d: {k: round(v / n_steps / 1000, 3) for k, v in
                       sorted(d.items(), key=lambda kv: -kv[1])[:top]}
    return round(program / n_steps / 1000, 3), to_ms(cats), to_ms(ops)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    from gdn_tpu.cli import add_common_args, apply_platform, build_config

    add_common_args(p)
    p.add_argument("--mode", choices=["DtoD", "RtoD"], default="RtoD")
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--logdir", type=str, default="/tmp/gdn_profile")
    p.add_argument("--top", type=int, default=12)
    args = p.parse_args()
    apply_platform(args)
    cfg = build_config(args)

    import jax

    from gdn_tpu.checkpoint import transfer_stage1_decoder
    from gdn_tpu.data.synthetic import synthetic_batch
    from gdn_tpu.models import DtoDNet, RtoDNet
    from gdn_tpu.train import create_state
    from gdn_tpu.train.steps import make_stage1_step, make_stage2_step

    h, w = cfg.model.image_size
    d_state = create_state(DtoDNet(cfg=cfg.model), (1, h, w, 1), cfg.train, 1)
    batch = synthetic_batch(
        jax.random.PRNGKey(0), args.batch_size, h, w, cfg.model.max_depth
    )
    if args.mode == "DtoD":
        state = d_state
        step = make_stage1_step(cfg, mesh=None)
        run = lambda s: step(s, batch)
    else:
        state = create_state(
            RtoDNet(cfg=cfg.model), (1, h, w, 3), cfg.train, 1,
            freeze_decoder=True,
        )
        state = state.replace(
            params=transfer_stage1_decoder(state.params, d_state.params)
        )
        step = make_stage2_step(cfg, mesh=None)
        run = lambda s: step(s, d_state.params, batch)

    state, terms = run(state)  # compile outside the trace
    float(terms["total"])      # forced completion (tunnel-safe)
    with jax.profiler.trace(args.logdir):
        for _ in range(args.steps):
            state, terms = run(state)
        float(terms["total"])

    program_ms, cats, ops = summarize_trace(
        args.logdir, args.steps, args.top
    )
    print(json.dumps({"program_ms_per_step": program_ms,
                      "imgs_per_sec_device": round(
                          args.batch_size / max(program_ms, 1e-9) * 1000, 1)}))
    print("top op categories (ms/step):")
    for k, v in cats.items():
        print(f"  {k[:60]:60s} {v:8.3f}")
    print("top individual ops (ms/step):")
    for k, v in ops.items():
        print(f"  {k[:60]:60s} {v:8.3f}")
    print(f"trace left in {args.logdir} (TensorBoard profile plugin)")


if __name__ == "__main__":
    main()
