"""Symbolic repeat-offset resolution (streamed big-frame decode):
resolve_offsets_symbolic + apply_hist must reproduce resolve_offsets for
any initial history, and composing split halves must equal the whole."""

import numpy as np
import jax.numpy as jnp

from zstd_tpu.ops.sequence import (apply_hist, compose_hist,
                                   resolve_offsets, resolve_offsets_symbolic)


def make_lanes(rng, B, S):
    ll = rng.integers(0, 5, (B, S)).astype(np.int32)
    # of_value mix: repcodes 1..3 and literal offsets 4..50
    ofv = np.where(rng.random((B, S)) < 0.5,
                   rng.integers(1, 4, (B, S)),
                   rng.integers(4, 50, (B, S))).astype(np.int32)
    real = rng.random((B, S)) < 0.8
    # some synthetic records with pre-resolved offsets
    ofv = np.where(real, ofv, rng.integers(0, 9, (B, S))).astype(np.int32)
    return jnp.asarray(ll), jnp.asarray(ofv), jnp.asarray(real)


def test_symbolic_matches_concrete():
    rng = np.random.default_rng(11)
    B, S = 16, 96
    ll, ofv, real = make_lanes(rng, B, S)
    hist = jnp.asarray(rng.integers(1, 2000, (B, 3)).astype(np.int32))

    off_c, ok_c = resolve_offsets(ll, ofv, real, hist)
    tag, val, tt, tv = resolve_offsets_symbolic(ll, ofv, real)
    off_s = apply_hist(tag, val, hist)
    ok_s = jnp.all(~real | (off_s > 0), axis=1)

    ok_c = np.asarray(ok_c)
    ok_s = np.asarray(ok_s)
    assert np.array_equal(ok_c, ok_s)
    # offsets must agree exactly on valid lanes (invalid lanes diverge
    # after the poisoning record by design)
    for b in range(B):
        if ok_c[b]:
            assert np.array_equal(np.asarray(off_c)[b], np.asarray(off_s)[b])


def test_chain_composition_equals_whole():
    rng = np.random.default_rng(7)
    B, S = 8, 120
    cut = 48
    ll, ofv, real = make_lanes(rng, B, S)
    hist0 = jnp.asarray(rng.integers(1, 500, (B, 3)).astype(np.int32))

    off_w, ok_w = resolve_offsets(ll, ofv, real, hist0)

    # two chained "groups" per lane
    t1, v1, tt1, tv1 = resolve_offsets_symbolic(
        ll[:, :cut], ofv[:, :cut], real[:, :cut])
    t2, v2, tt2, tv2 = resolve_offsets_symbolic(
        ll[:, cut:], ofv[:, cut:], real[:, cut:])
    off1 = apply_hist(t1, v1, hist0)
    hist1 = compose_hist(tt1, tv1, hist0)
    off2 = apply_hist(t2, v2, hist1)
    off_s = jnp.concatenate([off1, off2], axis=1)
    ok_s = jnp.all(~real | (off_s > 0), axis=1)

    assert np.array_equal(np.asarray(ok_w), np.asarray(ok_s))
    for b in range(B):
        if np.asarray(ok_w)[b]:
            assert np.array_equal(np.asarray(off_w)[b], np.asarray(off_s)[b])
