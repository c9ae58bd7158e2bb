"""Independent stand-ins for the reference's Cython dictionary-build kernels.

The reference's ``tamp build-dictionary`` pipeline
(/root/reference/tamp/cli/build_dictionary.py) is pure Python except for
three inner-loop kernels compiled from ``tamp/_c_build_dictionary.pyx``,
which do not ship compiled in this environment (no cython in the image).
This module provides the same three entry points — re-implemented
independently from the kernels' documented contracts and call sites — so
the *reference pipeline itself* can run here for the head-to-head test
(tests/test_dictbuild.py::test_build_dictionary_head_to_head_vs_reference_tool).

Contracts (from the .pyx docstrings and the call sites in
build_dictionary.py:90, 184, 246, 260):

- ``score_substrings(corpus, min_length, max_length, window_size,
  window_bits, literal_bits, huffman_bits)`` -> dict substring -> total
  bits saved across ALL occurrences (every sample truncated to
  ``window_size``; a length-L substring saves
  ``L*(1+literal_bits) - (huffman_bits[L-min_length] + window_bits)``
  bits per occurrence, entered only when positive).
- ``score_and_multi_frag(corpus, min_length, max_length, window_size,
  bits_saved_table, multi_frag_min_length)`` -> (scores, multi_frag):
  per-SAMPLE-distinct counts, a substring scored only when it appears in
  >= 2 samples, with bottom-up pruning (a length-L substring is counted
  only if its (L-1)-prefix appeared in >= 2 samples); ``multi_frag``
  collects the frequent substrings with length >= multi_frag_min_length.
  Scores are ``sample_count * bits_saved_table[L - min_length]`` (only
  when that table entry is positive; at the bootstrap length a
  non-positive entry also suppresses the multi_frag add).
- ``select_candidates(candidates, multi_frag_content, budget_remaining,
  overlap_threshold)``: walk ``(substring, score)`` tuples in order,
  keep only substrings present in ``multi_frag_content``, greedily accept
  the first whose ``overlap_threshold``-byte substrings are all unused,
  permanently dropping candidates that failed the overlap check, until
  the byte budget is reached.

This module exists ONLY for the head-to-head test; nothing in tamp_tpu
imports it.
"""

from __future__ import annotations

from collections import Counter


def score_substrings(corpus, min_length, max_length, window_size,
                     window_bits, literal_bits, huffman_bits):
    occurrences: Counter[bytes] = Counter()
    for sample in corpus:
        sample = sample[:window_size]
        top = min(max_length, len(sample))
        for length in range(min_length, top + 1):
            occurrences.update(
                sample[s:s + length] for s in range(len(sample) - length + 1))
    scores = {}
    for sub, n in occurrences.items():
        i = len(sub) - min_length
        if not 0 <= i < len(huffman_bits):
            continue
        saved = len(sub) * (1 + literal_bits) - (huffman_bits[i] + window_bits)
        if saved > 0:
            scores[sub] = n * float(saved)
    return scores


def _distinct_sample_counts(samples, length, frequent_prefixes):
    """Count, per substring of ``length``, in how many samples it occurs
    (each sample counted once), keeping only substrings whose
    (length-1)-byte prefix is in ``frequent_prefixes`` (None = keep all)."""
    counts: Counter[bytes] = Counter()
    for sample in samples:
        if len(sample) < length:
            continue
        if frequent_prefixes is None:
            subs = {sample[s:s + length]
                    for s in range(len(sample) - length + 1)}
        else:
            subs = {sample[s:s + length]
                    for s in range(len(sample) - length + 1)
                    if sample[s:s + length - 1] in frequent_prefixes}
        counts.update(subs)
    return counts


def score_and_multi_frag(corpus, min_length, max_length, window_size,
                         bits_saved_table, multi_frag_min_length):
    samples = [s[:window_size] for s in corpus if s[:window_size]]
    scores: dict[bytes, float] = {}
    multi_frag: set[bytes] = set()
    if not samples:
        return scores, multi_frag

    frequent = None  # None = bootstrap length (no prefix pruning)
    for length in range(min_length, max_length + 1):
        if frequent is not None and not frequent:
            break
        counts = _distinct_sample_counts(samples, length, frequent)
        i = length - min_length
        saved = bits_saved_table[i] if i < len(bits_saved_table) else 0
        bootstrap = frequent is None
        frequent = set()
        for sub, n in counts.items():
            if n < 2:
                continue
            frequent.add(sub)
            if saved > 0:
                scores[sub] = n * saved
            if length >= multi_frag_min_length and (saved > 0
                                                    or not bootstrap):
                multi_frag.add(sub)
    return scores, multi_frag


def select_candidates(candidates, multi_frag_content, budget_remaining,
                      overlap_threshold):
    pending = [c[0] for c in candidates if c[0] in multi_frag_content]
    used_subs: set[bytes] = set()
    accepted: list[bytes] = []
    used = 0
    while pending and used < budget_remaining:
        choice = None
        for i, cand in enumerate(pending):
            windows = range(len(cand) - overlap_threshold + 1)
            if any(cand[k:k + overlap_threshold] in used_subs
                   for k in windows):
                continue  # permanently dropped, like the reference kernel
            choice = cand
            pending = pending[i + 1:]
            break
        if choice is None:
            break
        accepted.append(choice)
        used += len(choice)
        for k in range(len(choice) - overlap_threshold + 1):
            used_subs.add(choice[k:k + overlap_threshold])
    return accepted
