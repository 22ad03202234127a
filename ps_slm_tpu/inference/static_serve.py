"""Static-batch server: the slot pool's API over batched ``generate``.

Measured on the trained short-answer checkpoint (docs/PERF.md), static
batching beats the continuous slot pool ~4x when completions are short:
the pool pays per-harvest host sync on every ``sync_every`` tokens, while
a static batch amortizes one prefill + a handful of steps across the whole
group.  This class gives that fast path the same ``run(requests)``
iterator contract as the pools (inference/continuous.py:349), so
``cli/serve.py`` can route between them by completion-length profile.

Shape policy: within each group, token/feature lengths are right-padded to
the group max rounded UP to the dataset buckets (token_bucket /
feature_bucket), and the batch axis is padded to the group size — so jit
signatures stay bounded exactly like the dataset's budget batching.
"""

from __future__ import annotations

import time
from typing import Dict, Iterator, Optional, Tuple

import numpy as np


def _round_up(n: int, b: int) -> int:
    return -(-max(n, 1) // b) * b


class StaticBatchDecoder:
    """Groups single-request payloads and decodes them with the static
    ``generate`` path (inference/generate.py — the reference's HF
    ``model.generate`` shape, ps-slm.py:660-675)."""

    def __init__(
        self, model, tc, dc, *, eos_token_id: int,
        batch_size: Optional[int] = None,
    ):
        self.model = model
        self.tc = tc
        self.eos = eos_token_id
        self.batch_size = batch_size or tc.decode_slots
        self.token_bucket = max(getattr(dc, "token_bucket", 8) or 8, 1)
        self.feature_bucket = max(getattr(dc, "feature_bucket", 16) or 16, 1)
        # waveforms bucket at 1 s (16 kHz): on-device fbank shapes
        self.wave_bucket = 16000
        self._supports_stop_after = False
        self._supports_stream = False

    # -- batching -----------------------------------------------------------
    def _stack(self, group):
        """Combine single-sample jbatches into one padded batch.

        input_ids/attention_mask are LEFT-padded (generation contract,
        ops/merge.py left_padding=True); features/waveforms are
        right-padded zeros with their explicit length arrays untouched.
        """
        pad_id = int(getattr(self.model, "pad_token_id", 0) or 0)
        b = self.batch_size
        n = len(group)
        # pad the batch axis by REPLICATING real samples (their outputs are
        # dropped): all-pad rows would push degenerate shapes (no speech
        # token, zero-length audio) through merge/CTC for nothing
        group = [group[i % n] for i in range(b)]
        s_max = _round_up(
            max(g["input_ids"].shape[1] for _, g in group), self.token_bucket
        )
        batch: Dict[str, np.ndarray] = {}
        ids = np.full((b, s_max), pad_id, np.int32)
        mask = np.zeros((b, s_max), bool)
        for i, (_, g) in enumerate(group):
            row = np.asarray(g["input_ids"])[0]
            m = np.asarray(g["attention_mask"])[0].astype(bool)
            ids[i, s_max - len(row):] = row
            mask[i, s_max - len(m):] = m
        batch["input_ids"] = ids
        batch["attention_mask"] = mask

        if any("input_features" in g for _, g in group):
            a_max = _round_up(
                max(g["input_features"].shape[1] for _, g in group),
                self.feature_bucket,
            )
            d = next(
                g for _, g in group if "input_features" in g
            )["input_features"].shape[-1]
            feats = np.zeros((b, a_max, d), np.float32)
            flen = np.zeros((b,), np.int32)
            for i, (_, g) in enumerate(group):
                f = np.asarray(g["input_features"])[0]
                feats[i, : f.shape[0]] = f
                flen[i] = int(np.asarray(g["input_feature_length"])[0])
            dtype = self.model.params["llm"]["embed_tokens"].dtype
            batch["input_features"] = feats.astype(dtype)
            batch["input_feature_length"] = flen
        elif any("waveform" in g for _, g in group):
            w_max = _round_up(
                max(g["waveform"].shape[1] for _, g in group),
                self.wave_bucket,
            )
            wav = np.zeros((b, w_max), np.float32)
            wlen = np.zeros((b,), np.int32)
            for i, (_, g) in enumerate(group):
                w = np.asarray(g["waveform"])[0]
                wav[i, : len(w)] = w
                wlen[i] = int(np.asarray(g["waveform_length"])[0])
            batch["waveform"] = wav
            # zero-length pad rows would make the fbank frontend emit
            # zero frames; 1-sample rows stay harmless and are dropped
            # with the pad outputs anyway
            batch["waveform_length"] = np.maximum(wlen, 1)
        return batch, n

    @staticmethod
    def _payload_kind(g) -> str:
        if "input_features" in g:
            return "input_features"
        if "waveform" in g:
            return "waveform"
        return "text"

    def _decode_group(self, group) -> Iterator[Tuple[str, np.ndarray]]:
        # _stack assumes one audio payload kind per batch (the features
        # branch indexes every member); a mixed group is legal at the API
        # level, so partition it by kind and decode each slice separately
        kinds = {self._payload_kind(g) for _, g in group}
        if len(kinds) > 1:
            for kind in sorted(kinds):
                sub = [
                    item for item in group
                    if self._payload_kind(item[1]) == kind
                ]
                yield from self._decode_group(sub)
            return
        yield from self._decode_uniform(group)

    def _decode_uniform(self, group) -> Iterator[Tuple[str, np.ndarray]]:
        import jax.numpy as jnp

        from ps_slm_tpu.inference.generate import generate

        tc = self.tc
        batch, n = self._stack(group)
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        out = np.asarray(generate(
            self.model, self.model.params, jb,
            eos_token_id=self.eos,
            num_beams=tc.num_beams,
            max_new_tokens=tc.max_new_tokens,
            do_sample=tc.do_sample,
            min_length=tc.min_length,
            top_p=tc.top_p,
            temperature=tc.temperature,
            length_penalty=tc.length_penalty,
            repetition_penalty=tc.repetition_penalty,
            kv_bits=tc.kv_cache_bits,
        ))
        for i in range(n):
            key = group[i][0]
            toks = out[i][out[i] != self.eos]
            yield key, np.asarray(toks, np.int32)

    # -- pool-compatible entry ----------------------------------------------
    def run(
        self, batches: Iterator[Tuple[str, Dict]], stop_after=None,
        on_partial=None,
    ) -> Iterator[Tuple[str, np.ndarray]]:
        """Same contract as the pools (inference/continuous.py::run):
        consume ``(key, jbatch)`` / ``None`` items, yield ``(key, tokens)``.
        ``None`` (live source, nothing ready) flushes a partial group so a
        trickle of requests is served at trickle latency."""
        if stop_after:
            raise ValueError("StaticBatchDecoder does not support stop_after")
        if on_partial is not None:
            raise ValueError(
                "StaticBatchDecoder does not support on_partial; streaming "
                "requests route to the slot pool"
            )
        batches = iter(batches)
        group = []
        while True:
            try:
                item = next(batches)
            except StopIteration:
                break
            if item is None:
                if group:
                    yield from self._decode_group(group)
                    group = []
                else:
                    time.sleep(0.001)
                continue
            group.append(item)
            if len(group) >= self.batch_size:
                yield from self._decode_group(group)
                group = []
        if group:
            yield from self._decode_group(group)
