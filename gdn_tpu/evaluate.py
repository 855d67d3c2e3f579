"""Evaluation harness reproducing the reference eval protocol
(SURVEY.md §2.7/§3.3):

  load ckpt -> per image: forward at train res -> upsample prediction
  to GT resolution -> crop/cap/mask -> accumulate the 7-metric table.

The forward+resize+metrics pipeline is one jitted program per GT
resolution; metrics are computed on device in fp32 and only the scalar
dict crosses to host, so eval fps measures the chip, not transfers.

Throughput structure (measured on the remote-attached chip, BASELINE.md):
  - ONE stacked (n_metrics, B) fetch per batch — a dict fetch costs one
    host round-trip per metric (~2.6 ms RTT floor each);
  - batch assembly + H2D upload runs in a background prefetch thread
    (the raw-res GT upload was the harness bottleneck: ~1.86 MB/image);
  - dispatch runs 2 batches ahead of the fetch point;
  - ``save_preds`` returns predictions FROM the eval step itself — no
    second forward pass.
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Any, Callable, Dict, Iterable, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gdn_tpu.config import Config
from gdn_tpu import metrics as M
from gdn_tpu.ops.resize import resize_bilinear


def make_eval_step(
    cfg: Config,
    forward: Callable[[Any, jnp.ndarray], jnp.ndarray],
    gt_shape: Tuple[int, int],
    return_preds: bool = False,
    mesh=None,
):
    """Jitted: (params, rgb (B,H,W,3), gt (B,Hg,Wg)) -> stacked
    (n_metrics, B) per-image metrics [+ train-res predictions when
    ``return_preds``] (protocol metrics stay per-image; the batch only
    amortizes dispatch + fills the chip).

    With ``mesh``, the step is data-parallel (SURVEY §2.7 x §2.10):
    params replicated, the batch sharded on "data", per-image metric
    columns computed on the owning chip — the eval-split throughput
    scales with the mesh.  cfg.eval.batch_size must divide mesh.size."""
    crop = jnp.asarray(M.crop_mask(gt_shape[0], gt_shape[1], cfg.eval.crop))

    def one(pred_small, gt2):
        pred = resize_bilinear(pred_small, gt_shape)
        gt_, pred_, range_mask = M.apply_cap(
            gt2, pred, cfg.model.min_depth, cfg.eval.cap
        )
        mask = range_mask & crop
        if cfg.eval.median_scaling:
            # scale the RAW pred (apply_cap clips; see median_scale doc)
            pred_ = M.median_scale(
                pred, gt_, mask, cfg.model.min_depth, cfg.eval.cap
            )
        return M.compute_errors(gt_, pred_, mask)

    def step(params, rgb, gt):
        if gt.dtype == jnp.uint16:  # "u16" wire: decode counts on device
            gt = gt.astype(jnp.float32) * (1.0 / 256.0)
        pred = forward(params, rgb)[..., 0]  # (B, H, W) train res
        per_image = jax.vmap(one)(pred, gt)
        # ONE stacked (n_metrics, B) output: a dict fetch is one host
        # round-trip per metric, which dominates eval time on
        # remote-attached TPUs (measured ~2.6 ms RTT floor each).
        stacked = jnp.stack([per_image[k] for k in M.METRIC_NAMES])
        return (stacked, pred) if return_preds else stacked

    if mesh is None:
        return jax.jit(step)
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gdn_tpu.parallel.mesh import batch_sharding, replicated

    rep = replicated(mesh)
    data = batch_sharding(mesh)
    cols = NamedSharding(mesh, P(None, "data"))  # (n_metrics, B)
    out_sh = (cols, data) if return_preds else cols
    return jax.jit(
        step, in_shardings=(rep, data, data), out_shardings=out_sh
    )


def _wire_encoders(cfg: Config):
    """Host-side wire encoders for (rgb, gt) H2D uploads (EvalConfig
    gt_wire / rgb_wire).  The matching device-side decode lives at the
    top of the eval step (u16 GT) or is implicit (bf16 RGB: the conv
    stack's own input cast, bit-identical when the model computes in
    bfloat16)."""
    if cfg.eval.gt_wire == "u16":
        def enc_gt(gt):
            return np.clip(np.round(gt * 256.0), 0, 65535).astype(np.uint16)
    elif cfg.eval.gt_wire == "f32":
        enc_gt = None
    else:
        raise ValueError(f"unknown gt_wire {cfg.eval.gt_wire!r} (f32|u16)")
    if cfg.eval.rgb_wire == "auto" and cfg.model.dtype == "bfloat16":
        import ml_dtypes

        def enc_rgb(rgb):
            return np.asarray(rgb, np.float32).astype(ml_dtypes.bfloat16)
    elif cfg.eval.rgb_wire in ("auto", "f32"):
        enc_rgb = None
    else:
        raise ValueError(
            f"unknown rgb_wire {cfg.eval.rgb_wire!r} (auto|f32)"
        )
    return enc_rgb, enc_gt


def _batch_iter(
    dataset: Iterable[Dict[str, np.ndarray]],
    bs: int,
    max_images: Optional[int],
    enc_rgb=None,
    enc_gt=None,
) -> Iterator[
    Tuple[Tuple[int, int], np.ndarray, np.ndarray, int, Tuple[int, ...]]
]:
    """Group per-image samples into (gt_shape, rgb, gt, n_real, indices)
    host batches of ``bs`` per GT resolution; the final partial batch
    per shape is padded with its last sample (discarded downstream).

    ``indices`` are the samples' positions in the DATASET order — the
    per-shape grouping interleaves batches out of dataset order on
    mixed-resolution splits, so consumers (--save_preds) must name
    outputs by these, not by completion order."""

    def assemble(samples):
        idxs, samples = zip(*samples)
        pad = bs - len(samples)
        rgb = np.concatenate(
            [np.asarray(s["rgb"]) for s in samples]
            + [np.asarray(samples[-1]["rgb"])] * pad
        )
        gt = np.concatenate(
            [np.asarray(s["gt"]) for s in samples]
            + [np.asarray(samples[-1]["gt"])] * pad
        )
        if enc_rgb is not None:
            rgb = enc_rgb(rgb)
        if enc_gt is not None:
            gt = enc_gt(gt)
        return rgb, gt, len(samples), idxs

    pending: Dict[Tuple[int, int], list] = {}
    n_in = 0
    for sample in dataset:
        if max_images is not None and n_in >= max_images:
            break
        shape = tuple(np.asarray(sample["gt"]).shape[1:3])
        pending.setdefault(shape, []).append((n_in, sample))
        n_in += 1
        if len(pending[shape]) == bs:
            yield (shape, *assemble(pending.pop(shape)))
    for shape in list(pending):
        yield (shape, *assemble(pending.pop(shape)))


def _prefetch(iterator, size: int = 2, sharding=None):
    """Background thread that uploads host batches to device ahead of
    the consumer (jax.device_put is async; the transfer overlaps the
    in-flight eval steps).  The raw-res GT is the big tensor here —
    uploading it synchronously serialized the whole harness before
    (VERDICT r2 weak item 5).

    Cancellation-safe: if the consumer abandons the generator (early
    exit / exception upstream), the producer observes ``stop`` instead
    of blocking forever on a full queue holding device buffers."""
    q: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()
    stop = threading.Event()
    err: list = []

    def producer():
        try:
            for shape, rgb, gt, n_real, idxs in iterator:
                item = (shape, jax.device_put(rgb, sharding),
                        jax.device_put(gt, sharding), n_real, idxs)
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.2)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except Exception as e:
            err.append(e)
        finally:
            while not stop.is_set():
                try:
                    q.put(sentinel, timeout=0.2)
                    break
                except queue.Full:
                    continue

    threading.Thread(target=producer, daemon=True).start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass


class Evaluator:
    """Persistent eval harness: the compiled forward and the
    per-GT-resolution jitted eval steps survive across :meth:`run`
    calls, and :meth:`cache_dataset` optionally makes the whole eval
    split device-resident so later passes do ZERO host batch assembly
    or H2D upload (the eval analogue of the train-side
    ``--device_cache``, BASELINE.md round 4).

    Why it exists: the in-training eval path (`train/loop.py
    --eval_every`) used to rebuild ``make_eval_forward`` and every eval
    step each epoch — a full retrace + XLA compile (~20-40 s through
    the remote tunnel) plus a fresh raw-res GT upload PER EVAL PASS.
    One Evaluator amortizes both across the run.
    """

    def __init__(
        self,
        cfg: Config,
        forward: Callable[[Any, jnp.ndarray], jnp.ndarray],
        mesh=None,
    ):
        self.cfg = cfg
        self.forward = forward
        self.mesh = mesh
        self._steps: Dict[Tuple[Tuple[int, int], bool], Callable] = {}
        self._warm: set = set()
        self._cached: Optional[list] = None
        self._sharding = None
        if mesh is not None:
            from gdn_tpu.parallel.mesh import batch_sharding

            bs = max(1, cfg.eval.batch_size)
            assert bs % mesh.size == 0, (
                f"eval.batch_size {bs} must be divisible by the mesh "
                f"size {mesh.size}"
            )
            self._sharding = batch_sharding(mesh)

    def _step(self, shape: Tuple[int, int], return_preds: bool):
        key = (shape, bool(return_preds))
        if key not in self._steps:
            self._steps[key] = make_eval_step(
                self.cfg, self.forward, shape,
                return_preds=return_preds, mesh=self.mesh,
            )
        return self._steps[key]

    def cache_dataset(
        self,
        dataset: Iterable[Dict[str, np.ndarray]],
        max_images: Optional[int] = None,
        max_bytes: int = 2 << 30,
    ) -> "Evaluator":
        """Encode + upload the whole eval split ONCE; subsequent
        :meth:`run` calls (``dataset=None``) read the device-resident
        batches.  Refuses loudly past ``max_bytes`` of wire-format
        payload (same 2 GiB gate as the train device cache) — callers
        fall back to the host-fed path."""
        enc_rgb, enc_gt = _wire_encoders(self.cfg)
        bs = max(1, self.cfg.eval.batch_size)
        batches, total = [], 0
        for shape, rgb, gt, n_real, idxs in _batch_iter(
            dataset, bs, max_images, enc_rgb, enc_gt
        ):
            total += rgb.nbytes + gt.nbytes
            if total > max_bytes:
                raise ValueError(
                    f"eval device cache exceeds {max_bytes / 2**30:.2f} "
                    f"GiB of HBM at image {sum(b[3] for b in batches)} "
                    "— use the host-fed path (omit device caching) or "
                    "bound the split with max_images"
                )
            batches.append(
                (shape, jax.device_put(rgb, self._sharding),
                 jax.device_put(gt, self._sharding), n_real, idxs)
            )
        self._cached = batches
        self.cached_bytes = total
        return self

    @property
    def cached_images(self) -> int:
        return sum(b[3] for b in self._cached or [])

    def run(
        self,
        params: Any,
        dataset: Optional[Iterable[Dict[str, np.ndarray]]] = None,
        max_images: Optional[int] = None,
        verbose: bool = True,
        save_preds: Optional[str] = None,
    ) -> Dict[str, float]:
        """One full eval pass; returns the metric table (+ 'fps').

        ``dataset=None`` replays the device-resident split from
        :meth:`cache_dataset` (``max_images`` was applied at cache
        build).  Otherwise identical to :func:`evaluate`."""
        cfg = self.cfg
        acc = M.MetricAccumulator()
        bs = max(1, cfg.eval.batch_size)
        n = 0
        t0 = None
        warm_s = 0.0  # compile warmups EXCLUDED from the fps window
        in_flight: list = []  # (metrics dev, preds dev|None, n_real, idxs)
        PIPELINE_DEPTH = 2  # batches dispatched ahead of the fetch point
        if save_preds:
            import os

            os.makedirs(save_preds, exist_ok=True)

        def drain(to_depth: int):
            nonlocal n
            while len(in_flight) > to_depth:
                stacked_dev, preds_dev, n_real, idxs = in_flight.pop(0)
                stacked = np.asarray(stacked_dev)  # (n_metrics,B), ONE fetch
                for i in range(n_real):
                    acc.update(
                        {k: float(stacked[j, i])
                         for j, k in enumerate(M.METRIC_NAMES)}
                    )
                    n += 1
                if preds_dev is not None:
                    import os

                    preds = np.asarray(preds_dev)
                    for i in range(n_real):
                        # dataset-order index, NOT completion order: the
                        # per-shape grouping interleaves mixed-resolution
                        # splits (_batch_iter docstring).
                        np.save(
                            os.path.join(
                                save_preds, f"pred_{idxs[i]:06d}.npy"
                            ),
                            preds[i],
                        )

        if dataset is None:
            if self._cached is None:
                raise ValueError(
                    "Evaluator.run(dataset=None) needs cache_dataset() "
                    "first"
                )
            batches: Iterable = self._cached
        else:
            enc_rgb, enc_gt = _wire_encoders(cfg)
            batches = _prefetch(
                _batch_iter(dataset, bs, max_images, enc_rgb, enc_gt),
                sharding=self._sharding,
            )
        for shape, rgb, gt, n_real, idxs in batches:
            step = self._step(shape, bool(save_preds))
            key = (shape, bool(save_preds))
            if key not in self._warm:
                # Warm up compile OUTSIDE the fps window — every new GT
                # resolution compiles, not just the first (fetch to
                # force completion; block_until_ready can return early
                # through remote-TPU tunnels).
                tw = time.perf_counter()
                out = step(params, rgb, gt)
                jax.tree.map(np.asarray, out)
                self._warm.add(key)
                if t0 is None:
                    t0 = time.perf_counter()
                else:
                    warm_s += time.perf_counter() - tw
            elif t0 is None:
                t0 = time.perf_counter()
            # Async dispatch; fetches happen in drain() so device compute
            # and the per-batch host round-trip overlap across batches.
            out = step(params, rgb, gt)
            if save_preds:
                in_flight.append((out[0], out[1], n_real, idxs))
            else:
                in_flight.append((out, None, n_real, idxs))
            drain(PIPELINE_DEPTH)
        drain(0)
        out = acc.result()
        if n > 0 and t0 is not None:
            out["fps"] = n / max(time.perf_counter() - t0 - warm_s, 1e-9)
        if verbose:
            print(acc.table())
            if "fps" in out:
                print(f"eval fps: {out['fps']:.1f}")
        return out


def evaluate(
    cfg: Config,
    params: Any,
    forward: Callable[[Any, jnp.ndarray], jnp.ndarray],
    dataset: Iterable[Dict[str, np.ndarray]],
    max_images: Optional[int] = None,
    verbose: bool = True,
    save_preds: Optional[str] = None,
    mesh=None,
    device_cache: bool = False,
) -> Dict[str, float]:
    """Run the eval split; returns the metric table (+ 'fps').

    `dataset` yields dicts with 'rgb' (1,H,W,3) at train res and
    'gt' (1,Hg,Wg) raw-resolution GT depth.  Samples are grouped into
    batches of ``cfg.eval.batch_size`` per GT resolution; batches are
    uploaded by a background prefetch thread and dispatched 2 deep.
    With ``mesh``, each batch is sharded over the data axis and the
    eval step runs data-parallel (metrics stay per-image).

    ``device_cache=True`` stages the whole split in HBM first (2 GiB
    wire-format gate), so the timed pass reads device-resident batches
    — no per-batch host assembly or H2D.  For repeated passes over one
    split, hold an :class:`Evaluator` instead and call ``run`` on it.
    """
    ev = Evaluator(cfg, forward, mesh=mesh)
    if device_cache:
        ev.cache_dataset(dataset, max_images=max_images)
        dataset = None
    return ev.run(
        params, dataset, max_images=max_images, verbose=verbose,
        save_preds=save_preds,
    )
