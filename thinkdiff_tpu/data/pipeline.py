"""Streaming WebDataset pipeline + loaders.

Replaces the reference's wds.DataPipeline / DataLoader(num_workers=N) stack
(reference: thinkdiff/datasets/datasets/cc_sbu_dataset.py:11-25,
dataloader_utils.py:15-162). Process-pool workers are unnecessary here: IO +
JPEG decode run in a small thread pool (PIL releases the GIL for decode), and
device transfer overlaps compute via a double-buffered prefetcher
(the reference's PrefetchLoader CUDA streams -> plain ``jax.device_put``
which is already async).
"""

from __future__ import annotations

import itertools
import queue
import random
import threading
import time
from typing import Any, Callable, Dict, Iterable, Iterator, List, Optional, Sequence

import numpy as np

from thinkdiff_tpu.data.tario import brace_expand, tar_sample_iterator


class WebDatasetPipeline:
    """shards -> samples -> shuffle buffer -> map -> batches (collated)."""

    def __init__(
        self,
        urls: Any,
        *,
        resample: bool = True,
        shuffle_buffer: int = 1000,
        decode: bool = True,
        map_fns: Sequence[Callable] = (),
        batch_size: Optional[int] = None,
        collator: Optional[Callable] = None,
        seed: int = 0,
        rank: int = 0,
        world_size: int = 1,
        epoch_samples: Optional[int] = None,
        token_budget: Optional[int] = None,
        sample_len_fn: Optional[Callable[[Dict[str, Any]], int]] = None,
        budget_len_cap: int = 128,
        budget_window: int = 256,
        min_batch: int = 8,
        sort_window: int = 0,
        sample_sort_fn: Optional[Callable[[Dict[str, Any]], Any]] = None,
    ):
        if isinstance(urls, str):
            urls = brace_expand(urls)
        self.urls = list(urls)
        self.resample = resample
        self.shuffle_buffer = shuffle_buffer
        self.decode = decode
        self.map_fns = list(map_fns)
        self.batch_size = batch_size
        self.collator = collator
        self.seed = seed
        self.rank = rank
        self.world_size = world_size
        self.epoch_samples = epoch_samples
        self.token_budget = token_budget
        self.sample_len_fn = sample_len_fn
        self.budget_len_cap = budget_len_cap
        self.budget_window = budget_window
        # min_batch may not exceed batch_size: otherwise the candidate
        # range in _budget_batch_iter is empty and every batch silently
        # lands at min_batch, exceeding both the configured batch size
        # and (potentially) the token budget.
        self.min_batch = min(min_batch, batch_size) if batch_size else min_batch
        # fixed-batch length grouping: hold ``sort_window`` samples, sort by
        # ``sample_sort_fn`` (or sample_len_fn), cut batches, shuffle batch
        # order. Same-bucket samples batch together so padded shapes shrink
        # (the static-shape analog of length-grouped batching; two-level
        # keys — see EmbedShardCollator.assign_split — also align the
        # label axis).
        self.sort_window = sort_window
        self.sample_sort_fn = sample_sort_fn

    def _shard_iter(self, rng: random.Random) -> Iterator[str]:
        if self.resample:
            while True:
                yield rng.choice(self.urls)
        else:
            shards = [u for i, u in enumerate(self.urls)
                      if i % self.world_size == self.rank]
            rng.shuffle(shards)
            yield from shards

    def _sample_iter(self) -> Iterator[Dict[str, Any]]:
        rng = random.Random(self.seed + self.rank)
        buf: List[Dict[str, Any]] = []
        count = 0
        for shard in self._shard_iter(rng):
            try:
                samples = tar_sample_iterator(shard, decode=self.decode)
                for sample in samples:
                    for fn in self.map_fns:
                        sample = fn(sample)
                        if sample is None:
                            break
                    if sample is None:
                        continue
                    if self.shuffle_buffer > 1:
                        buf.append(sample)
                        if len(buf) >= self.shuffle_buffer:
                            idx = rng.randrange(len(buf))
                            buf[idx], buf[-1] = buf[-1], buf[idx]
                            yield buf.pop()
                            count += 1
                    else:
                        yield sample
                        count += 1
                    if self.epoch_samples and count >= self.epoch_samples:
                        rng.shuffle(buf)
                        yield from buf
                        return
            except FileNotFoundError:
                continue
        rng.shuffle(buf)
        yield from buf

    def __iter__(self):
        it = self._sample_iter()
        if self.batch_size is None:
            return it
        if self.token_budget is not None:
            return self._budget_batch_iter(it)
        if self.sort_window and self.sort_window > self.batch_size:
            return self._sorted_batch_iter(it)
        return self._batch_iter(it)

    def _batch_iter(self, it) -> Iterator[Any]:
        while True:
            batch = list(itertools.islice(it, self.batch_size))
            if len(batch) < self.batch_size:
                return
            yield self.collator(batch) if self.collator else batch

    def _sorted_batch_iter(self, it) -> Iterator[Any]:
        """Fixed batch size, but batches are cut from a ``sort_window``
        window sorted by ``sample_sort_fn`` (falling back to
        sample_len_fn), then emitted in shuffled order — same samples,
        tighter padded shapes, no length curriculum."""
        key = self.sample_sort_fn or self.sample_len_fn
        assert key is not None, "sort_window requires a sort key fn"
        rng = random.Random(self.seed + self.rank + 17)
        leftover: List[Any] = []
        while True:
            window = leftover + list(
                itertools.islice(it, self.sort_window - len(leftover)))
            if len(window) < self.batch_size:
                return
            window.sort(key=key)
            n_full = len(window) // self.batch_size
            batches = [window[i * self.batch_size:(i + 1) * self.batch_size]
                       for i in range(n_full)]
            leftover = window[n_full * self.batch_size:]
            rng.shuffle(batches)
            for batch in batches:
                yield self.collator(batch) if self.collator else batch

    def _budget_batch_iter(self, it) -> Iterator[Any]:
        """Token-budget batching: batch size scales inversely with the
        length bucket so every batch carries ~token_budget padded tokens.

        This is the static-shape analog of the reference's dynamic
        ``padding='longest'`` batches (mllama_vllm_t5_embed_decoder_2.py:570
        keeps batch fixed and lets the token count float; here the token
        count is pinned — which is what bounds TPU step memory — and the
        batch floats in multiples of 8). Short-sample batches grow up to
        ``batch_size``, long ones shrink to ``min_batch``; a window of
        ``budget_window`` samples is length-sorted before cutting so
        same-bucket samples batch together, then batch order is shuffled to
        avoid a length curriculum."""
        from thinkdiff_tpu.data.collators import bucket_length

        assert self.sample_len_fn is not None, \
            "token_budget requires sample_len_fn"
        rng = random.Random(self.seed + self.rank + 1)
        max_batch = self.batch_size or 32
        leftover: List[Any] = []
        while True:
            window = leftover + list(
                itertools.islice(it, self.budget_window - len(leftover)))
            if len(window) < self.min_batch:
                return
            window.sort(key=self.sample_sort_fn or self.sample_len_fn)
            batches = []
            i = 0
            while i + self.min_batch <= len(window):
                bs = self.min_batch
                for cand in range(max_batch, self.min_batch - 1, -8):
                    if i + cand > len(window):
                        continue
                    cost = bucket_length(
                        self.sample_len_fn(window[i + cand - 1]),
                        self.budget_len_cap)
                    if cand * cost <= self.token_budget:
                        bs = cand
                        break
                batches.append(window[i:i + bs])
                i += bs
            # sub-min_batch tail rolls into the next window (no sample loss
            # on the streaming path)
            leftover = window[i:]
            rng.shuffle(batches)
            for batch in batches:
                yield self.collator(batch) if self.collator else batch


class MapDatasetLoader:
    """Batched loader over a random-access dataset + sampler (the wids
    precompute path — reference runner_process_data.py:86-91)."""

    def __init__(self, dataset, sampler, batch_size: int,
                 collator: Optional[Callable] = None, drop_last: bool = False,
                 num_threads: int = 8):
        self.dataset = dataset
        self.sampler = sampler
        self.batch_size = batch_size
        self.collator = collator
        self.drop_last = drop_last
        self.num_threads = num_threads

    def __len__(self):
        n = len(self.sampler)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self):
        from concurrent.futures import ThreadPoolExecutor

        indices = list(iter(self.sampler))
        with ThreadPoolExecutor(self.num_threads) as pool:
            for i in range(0, len(indices), self.batch_size):
                chunk = indices[i: i + self.batch_size]
                if self.drop_last and len(chunk) < self.batch_size:
                    return
                samples = list(pool.map(self.dataset.__getitem__, chunk))
                yield self.collator(samples) if self.collator else samples


def default_collate(samples: List[Dict[str, Any]]) -> Dict[str, Any]:
    """torch.default_collate analog: stack numeric fields, list the rest."""
    out: Dict[str, Any] = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        first = vals[0]
        if isinstance(first, np.ndarray):
            out[key] = np.stack(vals)
        elif isinstance(first, (int, float, np.integer, np.floating)):
            out[key] = np.asarray(vals)
        else:
            out[key] = vals
    return out


class AnnotationDataset:
    """Map-style dataset over annotation JSON files (reference
    base_dataset.py:17-56): accepts both a plain list and the
    ``{"annotations": [...]}`` layout, tags every record with a string
    ``instance_id``, and exposes the processor/collate hooks subclasses
    override."""

    def __init__(self, vis_processor=None, text_processor=None,
                 vis_root: Optional[str] = None,
                 ann_paths: Sequence[str] = ()):
        import json

        self.vis_root = vis_root
        self.annotation: List[Dict[str, Any]] = []
        for ann_path in ann_paths:
            with open(ann_path) as f:
                ann = json.load(f)
            self.annotation.extend(
                ann["annotations"] if isinstance(ann, dict) else ann)
        self.vis_processor = vis_processor
        self.text_processor = text_processor
        self._add_instance_ids()

    def __len__(self):
        return len(self.annotation)

    def __getitem__(self, index: int) -> Dict[str, Any]:
        return self.annotation[index]

    def collater(self, samples: List[Dict[str, Any]]) -> Dict[str, Any]:
        return default_collate(samples)

    def set_processors(self, vis_processor, text_processor):
        self.vis_processor = vis_processor
        self.text_processor = text_processor

    def _add_instance_ids(self, key: str = "instance_id"):
        for idx, ann in enumerate(self.annotation):
            ann[key] = str(idx)


class ConcatMapDataset:
    """Concatenation of map-style datasets whose collation keeps only the
    keys shared by EVERY sample in the batch (reference base_dataset.py:
    59-78 — mixing datasets with different field sets collates safely)."""

    def __init__(self, datasets: Sequence[Any]):
        if not datasets:
            raise ValueError("ConcatMapDataset needs at least one dataset")
        self.datasets = list(datasets)
        self._offsets = []
        total = 0
        for d in self.datasets:
            self._offsets.append(total)
            total += len(d)
        self._total = total

    def __len__(self):
        return self._total

    def __getitem__(self, index: int):
        if index < 0:
            index += self._total
        if not 0 <= index < self._total:
            raise IndexError(index)
        import bisect

        di = bisect.bisect_right(self._offsets, index) - 1
        return self.datasets[di][index - self._offsets[di]]

    def collater(self, samples: List[Dict[str, Any]]) -> Dict[str, Any]:
        shared = set(samples[0])
        for s in samples[1:]:
            shared &= set(s)
        return self.datasets[0].collater(
            [{k: s[k] for k in s if k in shared} for s in samples])


class IterLoader:
    """Infinite epoch-wrapping iterator (reference dataloader_utils.py:127-162)."""

    def __init__(self, loader, use_distributed: bool = False):
        self._loader = loader
        self._use_distributed = use_distributed
        self._epoch = 0
        self.iter_loader = iter(self._loader)

    @property
    def epoch(self) -> int:
        return self._epoch

    def __next__(self):
        try:
            return next(self.iter_loader)
        except StopIteration:
            self._epoch += 1
            sampler = getattr(self._loader, "sampler", None)
            if sampler is not None and hasattr(sampler, "set_epoch"):
                sampler.set_epoch(self._epoch)
            self.iter_loader = iter(self._loader)
            return next(self.iter_loader)

    def __iter__(self):
        return self

    def __len__(self):
        return len(self._loader)


class MultiIterLoader:
    """Sample from multiple loaders with given ratios
    (reference dataloader_utils.py:15-43)."""

    def __init__(self, loaders: List[Any], ratios: Optional[List[float]] = None,
                 seed: int = 0):
        self.loaders = loaders
        if ratios is None:
            ratios = [1.0] * len(loaders)
        total = sum(ratios)
        self.ratios = [r / total for r in ratios]
        self.rng = random.Random(seed)

    def __next__(self):
        idx = self.rng.choices(range(len(self.loaders)), weights=self.ratios)[0]
        return next(self.loaders[idx])

    def __iter__(self):
        return self


class ChainDataset:
    """Ratio-weighted sampling across multiple streaming pipelines
    (reference data_utils.py:33-63 — wds ChainDataset analog)."""

    def __init__(self, datasets: List[Any], ratios: Optional[List[float]] = None,
                 seed: int = 0):
        self.datasets = datasets
        if ratios is None:
            ratios = [1.0] * len(datasets)
        total = sum(ratios)
        self.ratios = [r / total for r in ratios]
        self.seed = seed

    def __iter__(self):
        rng = random.Random(self.seed)
        its = [iter(d) for d in self.datasets]
        alive = list(range(len(its)))
        while alive:
            weights = [self.ratios[i] for i in alive]
            pick = rng.choices(alive, weights=weights)[0]
            try:
                yield next(its[pick])
            except StopIteration:
                alive.remove(pick)


class PrefetchLoader:
    """Background-thread batch prefetch + async host->device transfer
    (replaces the CUDA-stream PrefetchLoader, reference
    dataloader_utils.py:46-124)."""

    def __init__(self, loader, device_put: Optional[Callable] = None,
                 depth: int = 2):
        self.loader = loader
        self.device_put = device_put
        self.depth = depth

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        sentinel = object()
        err: List[BaseException] = []

        def worker():
            try:
                for batch in self.loader:
                    if self.device_put is not None:
                        batch = self.device_put(batch)
                    q.put(batch)
            except BaseException as e:  # propagate into consumer
                err.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    raise err[0]
                return
            yield item
