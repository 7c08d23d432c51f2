import numpy as np
import pytest

from bitar_tpu.memory.arena import DeviceArena, SlotPool
from bitar_tpu.memory.host_pool import (
    POISON_BYTE,
    HostMemoryPool,
    PoolBackend,
    get_memory_pool,
)
from bitar_tpu.status import StatusError


def test_slot_pool_take_put():
    p = SlotPool(preallocated=20, max_slots=40, slot_size=128)
    got = p.take(5)
    assert len(got) == 5 and len(set(got)) == 5
    assert p.in_use() == 5
    p.put(got)
    assert p.in_use() == 0
    assert p.stats.num_takes == 5 and p.stats.num_puts == 5


def test_slot_pool_min_preallocate():
    # reference kMinPreallocateMemzones floor (memory.h:51)
    with pytest.raises(StatusError):
        SlotPool(preallocated=3, max_slots=40, slot_size=128)


def test_slot_pool_critical_growth_and_exhaustion():
    p = SlotPool(preallocated=20, max_slots=25, slot_size=128)
    got = p.take(24)  # grows past preallocation
    assert p.stats.critical_growths >= 1
    assert p.capacity == 24
    with pytest.raises(StatusError):  # beyond max_slots
        p.take(2)
    # failed take must not leak slots
    assert p.in_use() == 24
    p.put(got)


def test_slot_pool_double_put_rejected():
    p = SlotPool(preallocated=20, max_slots=40, slot_size=128)
    (s,) = p.take(1)
    p.put(s)
    with pytest.raises(StatusError):
        p.put(s)


def test_device_arena_write_gather_roundtrip(rng):
    arena = DeviceArena(slot_size=256, preallocated=20, max_slots=32)
    rows = rng.integers(0, 256, (4, 256), dtype=np.uint8)
    import jax.numpy as jnp
    slots = arena.pool.take(4)
    arena.write_burst(slots, jnp.asarray(rows))
    back = np.asarray(arena.gather_burst(slots))
    np.testing.assert_array_equal(back, rows)
    # out-of-order gather
    back2 = np.asarray(arena.gather_burst(slots[::-1]))
    np.testing.assert_array_equal(back2, rows[::-1])
    arena.pool.put(slots)


def test_device_arena_refs_and_recycle(rng):
    arena = DeviceArena(slot_size=128, preallocated=20, max_slots=32)
    refs = arena.take_refs([100, 50, 128])
    assert arena.pool.in_use() == 3
    assert arena.recycle(refs) == 3  # demo_app asserts recycle count parity
    assert arena.pool.in_use() == 0
    with pytest.raises(StatusError):  # unknown ref
        arena.recycle(refs)


def test_device_arena_read_host_respects_length(rng):
    arena = DeviceArena(slot_size=128, preallocated=20, max_slots=32)
    import jax.numpy as jnp
    data = rng.integers(0, 256, (1, 128), dtype=np.uint8)
    (ref,) = arena.take_refs([77])
    arena.write_burst([ref.slot], jnp.asarray(data))
    out = arena.read_host(ref)
    assert out.shape == (77,)
    np.testing.assert_array_equal(out, data[0, :77])


def test_host_pool_reuse_and_stats():
    pool = HostMemoryPool(PoolBackend.POOLED)
    b1 = pool.allocate(5000)
    assert b1.view().shape == (5000,)
    b1.free()
    b2 = pool.allocate(6000)  # same 8 KiB bucket -> reused
    assert pool.stats.num_reuses == 1
    b2.free()


def test_host_pool_poisoning():
    pool = HostMemoryPool(PoolBackend.POOLED, debug_poison=True)
    b = pool.allocate(100)
    assert (b.view() == POISON_BYTE).all()
    b.view()[:] = 1
    b.free()


def test_host_pool_aligned_backend():
    pool = HostMemoryPool(PoolBackend.ALIGNED)
    b = pool.allocate(10000)
    assert b.array.ctypes.data % 4096 == 0
    b.free()


def test_get_memory_pool_singleton():
    assert get_memory_pool(PoolBackend.POOLED) is get_memory_pool(PoolBackend.POOLED)
    assert get_memory_pool(PoolBackend.SYSTEM) is not get_memory_pool(PoolBackend.POOLED)


def test_double_free_is_noop():
    pool = HostMemoryPool(PoolBackend.POOLED)
    b = pool.allocate(100)
    b.free()
    b.free()  # second free is a no-op (pool handle cleared)
