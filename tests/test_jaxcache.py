"""Atomic jax compile-cache writes (utils/jaxcache).

jax's stock LRUCache.put is a bare write_bytes — two processes compiling
the same shape can tear an entry and every later reader SEGFAULTS on
deserialize (observed killing a full pytest run). The patch makes the
write tmp + os.replace."""

import os

import numpy as np


def test_lru_cache_put_is_atomic(tmp_path):
    import jax  # noqa: F401  (patch requires jax loaded)
    from fluorosequencingimageanalysis_tpu.utils.jaxcache import (
        ensure_atomic_cache_writes)

    ensure_atomic_cache_writes()
    from jax._src import lru_cache

    assert getattr(lru_cache.LRUCache, "_fluoro_atomic_put", False), \
        "patch did not apply to this jax version"
    cache = lru_cache.LRUCache(str(tmp_path), max_size=-1)
    cache.put("k1", b"hello world")
    assert cache.get("k1") == b"hello world"
    # No temp remnants; exactly the entry file.
    names = sorted(os.listdir(tmp_path))
    assert not any(n.endswith(".tmp") for n in names), names
    # Existing entries are never overwritten (jax's contract).
    cache.put("k1", b"different")
    assert cache.get("k1") == b"hello world"


def test_patch_is_idempotent():
    import jax  # noqa: F401
    from fluorosequencingimageanalysis_tpu.utils import jaxcache

    jaxcache.ensure_atomic_cache_writes()
    from jax._src import lru_cache

    put_before = lru_cache.LRUCache.put
    jaxcache.ensure_atomic_cache_writes()
    assert lru_cache.LRUCache.put is put_before
