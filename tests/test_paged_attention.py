"""Paged KV attention: XLA-gather oracle vs dense decode_attention, the
Pallas kernel (interpret mode) vs the oracle, and pool update helpers."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from thinkdiff_tpu.ops.decode_attention import decode_attention
from thinkdiff_tpu.ops.paged_attention import (
    commit_pages, paged_attention_pallas, paged_attention_xla,
    paged_update_kv,
)


def _random_paged(rng, slots, h, hkv, d, page, mp, pool_pages):
    """Build a random pool + per-slot tables/lengths, plus the equivalent
    dense (S, Hkv, MP*page, D) caches for the oracle comparison."""
    lengths = rng.integers(1, mp * page + 1, size=(slots,)).astype(np.int32)
    # non-overlapping page allocation, ids 1..; 0 stays trash
    table = np.zeros((slots, mp), np.int32)
    next_page = 1
    for s in range(slots):
        n = -(-int(lengths[s]) // page)
        table[s, :n] = np.arange(next_page, next_page + n)
        next_page += n
    assert next_page <= pool_pages
    k_pool = rng.standard_normal((pool_pages, hkv, page, d)).astype(np.float32)
    v_pool = rng.standard_normal((pool_pages, hkv, page, d)).astype(np.float32)
    q = rng.standard_normal((slots, h, d)).astype(np.float32)

    k_dense = k_pool[table].transpose(0, 2, 1, 3, 4).reshape(
        slots, hkv, mp * page, d)
    v_dense = v_pool[table].transpose(0, 2, 1, 3, 4).reshape(
        slots, hkv, mp * page, d)
    return q, k_pool, v_pool, table, lengths, k_dense, v_dense


def test_xla_oracle_matches_dense_decode_attention():
    rng = np.random.default_rng(0)
    q, kp, vp, table, lens, kd, vd = _random_paged(
        rng, slots=5, h=4, hkv=2, d=32, page=8, mp=4, pool_pages=32)
    out = paged_attention_xla(jnp.asarray(q), jnp.asarray(kp),
                              jnp.asarray(vp), jnp.asarray(table),
                              jnp.asarray(lens))
    ref = decode_attention(jnp.asarray(q)[:, :, None], jnp.asarray(kd),
                           jnp.asarray(vd), jnp.asarray(lens))[:, :, 0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pallas_kernel_matches_oracle_interpret():
    rng = np.random.default_rng(1)
    q, kp, vp, table, lens, _, _ = _random_paged(
        rng, slots=4, h=8, hkv=2, d=128, page=16, mp=3, pool_pages=16)
    got = paged_attention_pallas(
        jnp.asarray(q), jnp.asarray(kp), jnp.asarray(vp),
        jnp.asarray(table), jnp.asarray(lens), interpret=True)
    ref = paged_attention_xla(jnp.asarray(q), jnp.asarray(kp),
                              jnp.asarray(vp), jnp.asarray(table),
                              jnp.asarray(lens))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pallas_kernel_ignores_trash_and_stale_pages():
    """Garbage in the trash page / beyond-length positions must not leak."""
    rng = np.random.default_rng(2)
    q, kp, vp, table, lens, _, _ = _random_paged(
        rng, slots=3, h=4, hkv=2, d=128, page=16, mp=3, pool_pages=12)
    ref = paged_attention_xla(jnp.asarray(q), jnp.asarray(kp),
                              jnp.asarray(vp), jnp.asarray(table),
                              jnp.asarray(lens))
    kp2, vp2 = kp.copy(), vp.copy()
    kp2[0] = 1e4   # trash page poisoned
    vp2[0] = -1e4
    for s in range(3):
        off = int(lens[s]) % 16
        last = -(-int(lens[s]) // 16) - 1
        if off:
            kp2[table[s, last], :, off:] = 777.0   # beyond-length tail
            vp2[table[s, last], :, off:] = -777.0
    got = paged_attention_pallas(
        jnp.asarray(q), jnp.asarray(kp2), jnp.asarray(vp2),
        jnp.asarray(table), jnp.asarray(lens), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_paged_update_kv_roundtrip():
    rng = np.random.default_rng(3)
    slots, hkv, d, page, mp = 4, 2, 16, 8, 3
    pool_pages = 1 + slots * mp
    table = np.zeros((slots, mp), np.int32)
    for s in range(slots):
        table[s] = 1 + s * mp + np.arange(mp)
    k_pool = jnp.zeros((pool_pages, hkv, page, d))
    v_pool = jnp.zeros((pool_pages, hkv, page, d))
    lens = np.array([0, 7, 8, 23], np.int32)     # offsets 0, mid, boundary
    k_new = rng.standard_normal((slots, hkv, d)).astype(np.float32)
    v_new = rng.standard_normal((slots, hkv, d)).astype(np.float32)
    k_pool, v_pool = paged_update_kv(
        k_pool, v_pool, jnp.asarray(k_new), jnp.asarray(v_new),
        jnp.asarray(table), jnp.asarray(lens))
    kp = np.asarray(k_pool)
    for s in range(slots):
        pid = table[s, int(lens[s]) // page]
        np.testing.assert_allclose(kp[pid, :, int(lens[s]) % page], k_new[s],
                                   rtol=1e-6)
    # exactly `slots` rows written
    assert int((np.abs(kp).sum(axis=(1, 3)) > 0).sum()) == slots


def test_paged_update_kv_overflow_goes_to_trash():
    """cache_len at/past the table's capacity lands in a page the table maps
    to trash (or the clamped final row) — live pages of other slots are
    untouched."""
    slots, hkv, d, page, mp = 2, 2, 8, 4, 2
    table = np.array([[1, 0], [2, 0]], np.int32)  # one real page each
    k_pool = jnp.ones((4, hkv, page, d))
    v_pool = jnp.ones((4, hkv, page, d))
    lens = np.array([9, 4], np.int32)             # slot0 past capacity
    k_new = np.full((slots, hkv, d), 5.0, np.float32)
    k_pool2, _ = paged_update_kv(
        k_pool, v_pool, jnp.asarray(k_new), jnp.asarray(k_new),
        jnp.asarray(table), jnp.asarray(lens))
    kp = np.asarray(k_pool2)
    np.testing.assert_allclose(kp[1], 1.0)   # slot0's real page untouched
    np.testing.assert_allclose(kp[2], 1.0)   # slot1 wrote to trash (pg 0)
    assert (kp[0] == 5.0).any()


def test_commit_pages_layout():
    rng = np.random.default_rng(4)
    m, hkv, pad, d, page = 3, 2, 16, 8, 8
    pool = jnp.zeros((8, hkv, page, d))
    dense = rng.standard_normal((m, hkv, pad, d)).astype(np.float32)
    # slot i -> pages [1+2i, 2+2i]; slot 2's second page is trash
    rows = np.array([1, 2, 3, 4, 5, 0], np.int32)
    pool = commit_pages(pool, jnp.asarray(dense), jnp.asarray(rows))
    pn = np.asarray(pool)
    for i in range(m):
        for k in range(pad // page):
            dst = rows[i * (pad // page) + k]
            if dst == 0:
                continue
            np.testing.assert_allclose(
                pn[dst], dense[i, :, k * page:(k + 1) * page], rtol=1e-6)


def test_end_to_end_prefill_then_decode_matches_dense():
    """Simulate the engine flow: commit a dense prompt cache to pages, then
    N paged decode steps (update + attend) must match the dense path."""
    rng = np.random.default_rng(5)
    slots, h, hkv, d, page = 2, 4, 2, 32, 8
    prompt_lens = np.array([5, 11], np.int32)
    pad = 16
    steps = 4
    mp = -(-int(pad + steps) // page)             # capacity per slot
    pool_pages = 1 + slots * mp
    table = np.zeros((slots, mp), np.int32)
    nxt = 1
    for s in range(slots):
        n = -(-int(prompt_lens[s] + steps) // page)
        table[s, :n] = np.arange(nxt, nxt + n)
        nxt += n

    dense_prompt = rng.standard_normal((slots, hkv, pad, d)).astype(np.float32)
    for s in range(slots):                         # garbage beyond prompt
        dense_prompt[s, :, prompt_lens[s]:] = 99.0

    # paged state
    rows = []
    for s in range(slots):
        npg = -(-int(prompt_lens[s]) // page)
        for k in range(pad // page):
            rows.append(table[s, k] if k < npg else 0)
    rows = np.asarray(rows, np.int32)
    k_pool = commit_pages(jnp.zeros((pool_pages, hkv, page, d)),
                          jnp.asarray(dense_prompt), jnp.asarray(rows))
    v_pool = commit_pages(jnp.zeros((pool_pages, hkv, page, d)),
                          jnp.asarray(dense_prompt), jnp.asarray(rows))

    # dense state
    cache = np.zeros((slots, hkv, pad + steps, d), np.float32)
    cache[:, :, :pad] = dense_prompt

    lens = prompt_lens.copy()
    for t in range(steps):
        q = rng.standard_normal((slots, h, d)).astype(np.float32)
        k_new = rng.standard_normal((slots, hkv, d)).astype(np.float32)
        k_pool, v_pool = paged_update_kv(
            k_pool, v_pool, jnp.asarray(k_new), jnp.asarray(k_new),
            jnp.asarray(table), jnp.asarray(lens))
        for s in range(slots):
            cache[s, :, lens[s]] = k_new[s]
        lens = lens + 1
        got = paged_attention_xla(
            jnp.asarray(q), k_pool, v_pool, jnp.asarray(table),
            jnp.asarray(lens))
        ref = decode_attention(
            jnp.asarray(q)[:, :, None], jnp.asarray(cache),
            jnp.asarray(cache), jnp.asarray(lens))[:, :, 0]
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
