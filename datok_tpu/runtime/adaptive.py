"""Adaptive hot-set coverage: route each batch to one of two fused
engines by its sampled cold rate.

SUPERSEDED as the default by per-wave hot specs (jax_engine.wave_spec,
round 5): BatchEngine(per_wave=True) census-builds each wave's own hot
set and swaps it under one compiled machine, which beats both of this
module's static engines on every measured workload (novel prose 40 vs
53 MB/s wide; mixed 216 vs 205).  This router remains useful when the
native census is unavailable (pure-Python hosts) or when a caller
wants two FIXED configurations with no per-wave work.

One static hot-set size cannot serve both workload families (measured
on v5e, DE model, B=32K — BENCH_LOG rounds 4-5): uniform prose wants a
narrow hot set (H≤640: 375-383 MB/s; H=768 costs ~8% per step), while
mixed-length real text with rare-word regions wants coverage (H=768 +
a 256-row meta ring: 205 MB/s vs 138 at the narrow default) because
every cold transition stalls its lane for roughly one kernel round
(pallas_engine injection note).  The deciding statistic is the fraction
of transition fetches leaving the narrow hot set, measured here by an
exact native scalar walk (`dt_cold_rate`) over a small document sample
— ~0.5 ms per wave at the default 64 KB sample, against wave device
times of ~100 ms.  Measured separation on the narrow auto hot set (DE):
uniform bench text 0.28%, rotated-hetero lanes 0.28% (same text),
mixed conformance corpus 0.99% — the 0.5% default threshold splits the
families cleanly.

The two engines have INDEPENDENT symbol-class tables (HotSpec.cls_tab
is derived from the packed hot subtable, so it differs per hot set),
hence each wave must be ENCODED by the engine that will run it —
choose, then encode: :meth:`AdaptiveEngine.choose` takes raw texts.
Wide-engine construction (tables + first compile) is lazy, so uniform
corpora never pay for it.

Reference counterpart: none — the Go runtime is a scalar loop with no
hot/cold split (matrix.go:383-635); this is TPU-side machinery for the
same exact semantics.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from .jax_engine import BatchEngine

# wide-engine overrides, measured on the mixed-real corpus (v5e,
# BENCH_LOG r5): H=768 pring=256 pool=8 → 205 MB/s vs 138 for the
# narrow default; pring=512, K=192, H=896/1024 all measured worse
WIDE_CONFIG = dict(hot_size=768, kernel_pring=256, kernel_pool=8)

# cold-fetch fraction above which the wide engine wins (see module
# docstring for the measured separation)
COLD_THRESHOLD = 0.005

# per-choice sample budget: chars walked by the native scalar loop
SAMPLE_CHARS = 65536


class AdaptiveEngine:
    """Two fused engines (narrow default / wide covered) behind one
    choose-then-run surface."""

    def __init__(
        self,
        tok,
        threshold: float = COLD_THRESHOLD,
        sample_chars: int = SAMPLE_CHARS,
        wide_config: Optional[dict] = None,
        **engine_kwargs,
    ):
        self.tok = tok
        self.threshold = threshold
        self.sample_chars = sample_chars
        self._wide_config = dict(WIDE_CONFIG if wide_config is None
                                 else wide_config)
        self._kwargs = engine_kwargs
        self.narrow = BatchEngine(tok, **engine_kwargs)
        self._wide: Optional[BatchEngine] = None
        self.last_choice = "narrow"
        self.last_cold_rate = 0.0
        if getattr(self.narrow, "spec", None) is not None:
            mask = np.zeros(self.narrow.rep.S + 1, dtype=np.uint8)
            mask[self.narrow.spec.hot_full] = 1
            self._hot_mask = mask
        else:
            self._hot_mask = None  # general engine: nothing to adapt

    @property
    def wide(self) -> BatchEngine:
        if self._wide is None:
            kw = dict(self._kwargs)
            kw.update(self._wide_config)
            self._wide = BatchEngine(self.tok, **kw)
        return self._wide

    def cold_rate(self, texts: Sequence[str]) -> float:
        """Sampled cold-fetch fraction of ``texts`` against the narrow
        hot set (exact native walk; 0.0 when the native library or an
        accelerated spec is unavailable — the narrow engine is always
        a correct choice)."""
        if self._hot_mask is None:
            return 0.0
        from ..utils.native import native_cold_rate

        from .jax_engine import sample_texts

        sample = sample_texts(texts, self.sample_chars)
        if sample is None:
            return 0.0
        cps = np.frombuffer(
            sample.encode("utf-32-le"), dtype=np.int32
        )
        metas = self.narrow.encoder.encode(cps)
        res = native_cold_rate(
            self.tok, np.asarray(metas, np.int32), self._hot_mask
        )
        if res is None:
            return 0.0
        cold, fetches = res
        return cold / max(fetches, 1)

    def choose(self, texts: Sequence[str]) -> BatchEngine:
        """Pick the engine for this batch of documents.  The returned
        engine's ``encoder`` must be used to encode the batch (the two
        engines' symbol-class tables differ)."""
        rate = self.cold_rate(texts)
        self.last_cold_rate = rate
        if rate > self.threshold:
            self.last_choice = "wide"
            return self.wide
        self.last_choice = "narrow"
        return self.narrow

    # -- convenience passthroughs (single-shot surfaces) ---------------

    def tokenize_batch(self, texts, flags=None):
        return self.choose(texts).tokenize_batch(texts, flags)

    def events_batch(self, texts):
        return self.choose(texts).events_batch(texts)
