"""Host input pipelines.

The reference feeds its graph through TF queue runners — filename queue +
RandomShuffleQueue + reader threads (/root/reference/data/dataset_base.py:
151-237).  The TPU-native replacement: a background host thread assembles
raw full-frame numpy batches from npz shards; the (crop, center-of-mass)
preprocessing then runs as ONE jitted static-shape program on device (see
densereg_tpu.preprocess); batches are finally laid out for the train step's
``(sub_batch, batch, ...)`` accumulation axis and, under a mesh, scattered
with a ``NamedSharding``.

Raw host->device traffic per micro batch is tiny (a 320x240 uint16 frame is
150 KB) and overlaps with compute through the prefetch queue.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import jax.numpy as jnp
import numpy as np

from densereg_tpu.data.base import DatasetSpec
from densereg_tpu.preprocess import (
    preprocess_batch_from_bbx,
    preprocess_batch_from_pose,
)


def partition_for_host(items, host_id: int, num_hosts: int):
    """Disjoint round-robin split of shards across hosts; when there are
    fewer shards than hosts every host keeps them all (they then diverge by
    host-seeded shuffle order instead).  The multi-host replacement for the
    reference's single-process filename queue
    (/root/reference/data/dataset_base.py:164-172)."""
    if num_hosts <= 1 or len(items) < num_hosts:
        return list(items)
    return list(items[host_id::num_hosts])


def _load_frames(reader, idxs, spec: DatasetSpec):
    # Depth stays in the shards' native dtype (uint16) all the way to the
    # device: the jitted preprocess casts to float32 on-chip, so the
    # host->device transfer moves 2 bytes/pixel instead of 4.  That path is
    # the measured bottleneck of the eval/serving loop through the relay.
    depth = reader["depth"][idxs][..., None]
    pose = reader["pose"][idxs].astype(np.float32)
    if spec.pose_select is not None and pose.shape[-1] != spec.pose_dim:
        pose = pose[:, spec.pose_select]
    names = [str(n) for n in reader["name"][idxs]]
    bbx = reader["bbx"][idxs].astype(np.float32) if "bbx" in reader._load() \
        else None
    return depth, pose, names, bbx


def device_prefetch(it, depth: int = 2):
    """Lookahead wrapper: keep ``depth`` batches' device work enqueued ahead
    of the consumer.

    ``InputPipeline.__iter__`` dispatches the transfer + jitted preprocess
    asynchronously, but the train loop only asks for batch k+1 *after* step
    k's host-side sync points (deferred NaN-guard flush, logging) — through
    a remote-attached TPU that ordering leaves the k+1 transfer exposed
    instead of overlapped with step k's compute.  Pulling eagerly restores
    the overlap; on locally-attached chips it is simply a small pipeline
    depth.  (The reference gets the same effect from its input queue
    runners, /root/reference/data/dataset_base.py:164-193.)
    """
    from collections import deque

    it = iter(it)
    buf = deque()
    try:
        for _ in range(max(depth, 1)):
            buf.append(next(it))
    except StopIteration:
        pass
    while buf:
        out = buf.popleft()
        try:
            buf.append(next(it))
        except StopIteration:
            pass
        yield out


class InputPipeline:
    """Shuffled, endless training pipeline.

    Yields device-ready dicts ``{dm, pose, cfg, com}`` with leading axes
    ``(sub_batch, batch_size, ...)`` (the gradient-accumulation layout of
    :func:`densereg_tpu.train.step.train_step_single`).
    """

    def __init__(self, spec: DatasetSpec, batch_size: int, sub_batch: int = 1,
                 input_hw=(128, 128), seed: int = 0, mesh=None,
                 prefetch: int = 4, num_workers: int = 1,
                 host_preprocess: bool = False,
                 wire_dtype: str = "float32"):
        import jax

        from densereg_tpu.wire import WIRE_DTYPES

        self.spec = spec
        self.batch_size = batch_size
        self.sub_batch = sub_batch
        self.input_hw = input_hw
        self.mesh = mesh
        # host_preprocess: run the crop/com program on the HOST's CPU
        # backend and transfer the cropped (b,h,w,1) float32 instead of raw
        # full frames.  Same jitted program, same semantics — only the
        # device boundary moves.  Worth it only on transfer-starved
        # topologies (a remote-relay chip: 13 MB/batch vs 30 MB uint16 full
        # frames at 200x(240x320); see BASELINE.md round 3) — on a locally
        # attached chip keep the default and let the device do the crop.
        # The CPU program runs inside the PRODUCER threads, so its cost
        # overlaps the accelerator's compute instead of serializing with it
        # in the consumer loop (jit dispatch is thread-safe and
        # jax.default_device is a thread-local config scope).
        self.host_preprocess = host_preprocess
        # wire_dtype="uint16": the producers additionally encode the crop
        # as per-batch fixed-point uint16 (densereg_tpu.wire, ~0.005 mm
        # quantization — see its module docstring), halving the wire bytes
        # again (6.5 MB vs 13 MB at 200x(128x128)); the consumer dequantizes
        # on device in one elementwise pass
        if wire_dtype not in WIRE_DTYPES:
            raise ValueError(f"wire_dtype must be one of {WIRE_DTYPES}")
        if wire_dtype != "float32" and not host_preprocess:
            raise ValueError("wire_dtype=uint16 requires host_preprocess "
                             "(the device-crop path already ships raw "
                             "uint16 frames)")
        self.wire_dtype = wire_dtype
        self._cpu = jax.devices("cpu")[0] if host_preprocess else None
        # multi-host: each process reads a disjoint shard subset and
        # produces only its 1/num_hosts slice of the global batch; the
        # slices become one global jax.Array in parallel.mesh.shard_batch
        self._num_hosts = jax.process_count() if mesh is not None else 1
        self._host_id = jax.process_index() if mesh is not None else 0
        if batch_size % self._num_hosts:
            raise ValueError(f"batch_size {batch_size} not divisible by "
                             f"{self._num_hosts} hosts")
        self.local_batch = batch_size // self._num_hosts
        self._q: queue.Queue = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        # Parallel-interleave producers (each with its own shard order);
        # numpy's zlib decompression releases the GIL so workers overlap.
        self._threads = [
            threading.Thread(
                target=self._producer,
                args=(np.random.default_rng(
                    seed + 7919 * i + 104729 * self._host_id),),
                daemon=True)
            for i in range(max(num_workers, 1))
        ]
        for t in self._threads:
            t.start()

    # -- host side ---------------------------------------------------------
    def _host_crop(self, dms, poses):
        """Run the crop/com program on the CPU backend (producer-thread
        side); returns float32 numpy (dm, pose, cfgs, coms)."""
        import jax

        h, w = self.input_hw
        with jax.default_device(self._cpu):
            out = preprocess_batch_from_pose(
                np.ascontiguousarray(dms), np.ascontiguousarray(poses),
                np.asarray(self.spec.cfg.as_array()), h, w,
                self.spec.fixed_bg_threshold)
        return tuple(np.asarray(x) for x in out)

    def _producer(self, rng):
        # drop empty shards (linspace sharding can leave some empty when the
        # sample count is below the dataset's conventional shard count)
        readers = [r for r in self.spec.readers() if len(r) > 0]
        readers = partition_for_host(readers, self._host_id, self._num_hosts)
        need = self.local_batch * self.sub_batch
        pool_d, pool_p = [], []
        while not self._stop.is_set():
            order = rng.permutation(len(readers))
            for ri in order:
                reader = readers[ri]
                idxs = rng.permutation(len(reader))
                d, p, _, _ = _load_frames(reader, idxs, self.spec)
                pool_d.append(d)
                pool_p.append(p)
                total = sum(x.shape[0] for x in pool_d)
                while total >= need:
                    dcat = np.concatenate(pool_d)
                    pcat = np.concatenate(pool_p)
                    batch_d, rest_d = dcat[:need], dcat[need:]
                    batch_p, rest_p = pcat[:need], pcat[need:]
                    pool_d, pool_p = [rest_d], [rest_p]
                    total = rest_d.shape[0]
                    if self.host_preprocess:
                        item = self._host_crop(batch_d, batch_p)
                        if self.wire_dtype == "uint16":
                            from densereg_tpu.wire import encode_dm_u16
                            q, scale = encode_dm_u16(item[0])
                            item = (q, scale) + tuple(item[1:])
                    else:
                        item = (batch_d, batch_p)
                    # retry until delivered: a first-batch TPU compile can
                    # keep the prefetch queue full for minutes, and dropping
                    # a composed batch here would silently break the seeded
                    # determinism contract (ADVICE r3)
                    while True:
                        try:
                            self._q.put(item, timeout=60)
                            break
                        except queue.Full:
                            if self._stop.is_set():
                                return
                if self._stop.is_set():
                    return

    # -- device side -------------------------------------------------------
    def __iter__(self) -> Iterator[dict]:
        h, w = self.input_hw
        cfg = self.spec.cfg.as_array()
        while True:
            if self.host_preprocess:
                # producers already cropped on the CPU backend; the consumer
                # only ships the cropped batch over the wire (async dispatch)
                item = self._q.get()
                if self.wire_dtype == "uint16":
                    from densereg_tpu.wire import decode_dm_u16

                    q, scale, pose, cfgs, coms = item
                    # dequantize on device: one fused elementwise pass over
                    # the batch, paid once vs half the wire bytes
                    dm = decode_dm_u16(jnp.asarray(q), jnp.asarray(scale))
                    pose, cfgs, coms = (jnp.asarray(x)
                                        for x in (pose, cfgs, coms))
                else:
                    dm, pose, cfgs, coms = (jnp.asarray(x) for x in item)
            else:
                dms, poses = self._q.get()
                dm, pose, cfgs, coms = preprocess_batch_from_pose(
                    jnp.asarray(dms), jnp.asarray(poses), cfg, h, w,
                    self.spec.fixed_bg_threshold)
            batch = {
                "dm": dm.reshape(self.sub_batch, self.local_batch, h, w, 1),
                "pose": pose.reshape(self.sub_batch, self.local_batch, -1),
                "cfg": cfgs.reshape(self.sub_batch, self.local_batch, 6),
                "com": coms.reshape(self.sub_batch, self.local_batch, 3),
            }
            if self.mesh is not None:
                from densereg_tpu.parallel import shard_batch
                batch = shard_batch(batch, self.mesh, batch_dim=1)
            yield batch

    def close(self):
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass


class TestPipeline:
    """Sequential single-epoch pipeline yielding ``{dm, pose, cfg, com,
    name}`` batches (the reference's FIFO test reader,
    /root/reference/data/dataset_base.py:210-237 and the NYU bbx variant,
    /root/reference/data/nyu.py:222-249).  The final batch is padded by
    repetition to keep shapes static; ``evaluate_stream`` truncates at
    ``exact_num``."""

    def __init__(self, spec: DatasetSpec, batch_size: int,
                 input_hw=(128, 128), mesh=None,
                 host_preprocess: bool = False,
                 wire_dtype: str = "float32",
                 shard_slice: Optional[slice] = None):
        import jax

        from densereg_tpu.wire import WIRE_DTYPES

        self.spec = spec
        self.batch_size = batch_size
        self.input_hw = input_hw
        self.mesh = mesh
        # shard_slice restricts iteration to a contiguous range of the
        # DEDUPED non-empty shard list (see unique_readers) — the unit of
        # multi-host eval partitioning (eval/loop.evaluate_multihost):
        # contiguous ranges preserve dataset order under concatenation
        self.shard_slice = shard_slice
        # same trade-off as InputPipeline.host_preprocess: crop on the host
        # CPU backend, ship cropped float32 instead of raw full frames
        self.host_preprocess = host_preprocess
        # wire_dtype="uint16": additionally ship the crop as per-batch
        # fixed-point uint16 (densereg_tpu.wire) — half the bytes again;
        # the consumer passes the scale to make_infer_fn's dm_scale
        if wire_dtype not in WIRE_DTYPES:
            raise ValueError(f"wire_dtype must be one of {WIRE_DTYPES}")
        if wire_dtype != "float32" and not host_preprocess:
            raise ValueError("wire_dtype=uint16 requires host_preprocess "
                             "(the device-crop path already ships raw "
                             "uint16 frames)")
        self.wire_dtype = wire_dtype
        self._cpu = jax.devices("cpu")[0] if host_preprocess else None
        # The GSPMD eval path is single-controller: every host would emit
        # the FULL global batch, so shard_batch's multi-host assembly would
        # build a duplicated, num_hosts-times-oversized array.  Multi-host
        # evaluation instead partitions SHARDS per process and merges the
        # per-host result dumps (eval/loop.evaluate_multihost; the CLI
        # `test` routes there automatically under jax.distributed).
        if mesh is not None and jax.process_count() > 1:
            raise NotImplementedError(
                "TestPipeline cannot shard one global batch across hosts; "
                "use eval.loop.evaluate_multihost (shard-partitioned, "
                "local-device inference + rank-0 result merge)")

    def unique_readers(self):
        """The deduped, non-empty shard list in dataset order (the
        reference duplicates its last shard for queue-capacity reasons;
        iterating it twice would double-count frames)."""
        out, seen = [], set()
        for reader in self.spec.readers():
            if reader.path in seen or len(reader) == 0:
                continue
            seen.add(reader.path)
            out.append(reader)
        return out

    def __iter__(self) -> Iterator[dict]:
        h, w = self.input_hw
        cfg = self.spec.cfg.as_array()
        bs = self.batch_size
        buf_d, buf_p, buf_n, buf_b = [], [], [], []
        readers = self.unique_readers()
        if self.shard_slice is not None:
            readers = readers[self.shard_slice]
        for reader in readers:
            idxs = np.arange(len(reader))
            d, p, names, bbx = _load_frames(reader, idxs, self.spec)
            for i in range(len(idxs)):
                buf_d.append(d[i])
                buf_p.append(p[i])
                buf_n.append(names[i])
                if bbx is not None:
                    buf_b.append(bbx[i])
                if len(buf_d) == bs:
                    yield self._emit(buf_d, buf_p, buf_n, buf_b, cfg, h, w)
                    buf_d, buf_p, buf_n, buf_b = [], [], [], []
        if buf_d:
            while len(buf_d) < bs:  # pad final batch by repetition
                buf_d.append(buf_d[-1])
                buf_p.append(buf_p[-1])
                buf_n.append(buf_n[-1])
                if buf_b:
                    buf_b.append(buf_b[-1])
            yield self._emit(buf_d, buf_p, buf_n, buf_b, cfg, h, w)

    def _emit(self, buf_d, buf_p, buf_n, buf_b, cfg, h, w):
        if self.host_preprocess:
            import jax

            with jax.default_device(self._cpu):
                if self.spec.uses_bbx and buf_b:
                    out = preprocess_batch_from_bbx(
                        np.stack(buf_d), np.stack(buf_p), np.stack(buf_b),
                        np.asarray(cfg), h, w)
                else:
                    out = preprocess_batch_from_pose(
                        np.stack(buf_d), np.stack(buf_p), np.asarray(cfg),
                        h, w, self.spec.fixed_bg_threshold)
            dm, pose, cfgs, coms = (np.asarray(x) for x in out)
            if self.wire_dtype == "uint16":
                from densereg_tpu.wire import encode_dm_u16
                q, scale = encode_dm_u16(dm)
                batch = {"dm": jnp.asarray(q), "pose": jnp.asarray(pose),
                         "cfg": jnp.asarray(cfgs), "com": jnp.asarray(coms),
                         "dm_scale": jnp.asarray(scale),
                         "name": list(buf_n)}
                if self.mesh is not None:
                    from densereg_tpu.parallel import shard_batch
                    # dm_scale is a broadcast scalar — replicated, unsharded
                    arrays = {k: batch[k]
                              for k in ("dm", "pose", "cfg", "com")}
                    batch.update(shard_batch(arrays, self.mesh, batch_dim=0))
                return batch
            dm, pose, cfgs, coms = (jnp.asarray(x)
                                    for x in (dm, pose, cfgs, coms))
        elif self.spec.uses_bbx and buf_b:
            dm, pose, cfgs, coms = preprocess_batch_from_bbx(
                jnp.asarray(np.stack(buf_d)), jnp.asarray(np.stack(buf_p)),
                jnp.asarray(np.stack(buf_b)), cfg, h, w)
        else:
            dm, pose, cfgs, coms = preprocess_batch_from_pose(
                jnp.asarray(np.stack(buf_d)), jnp.asarray(np.stack(buf_p)),
                cfg, h, w, self.spec.fixed_bg_threshold)
        batch = {"dm": dm, "pose": pose, "cfg": cfgs, "com": coms,
                 "name": list(buf_n)}
        if self.mesh is not None:
            from densereg_tpu.parallel import shard_batch
            arrays = {k: batch[k] for k in ("dm", "pose", "cfg", "com")}
            batch.update(shard_batch(arrays, self.mesh, batch_dim=0))
        return batch
