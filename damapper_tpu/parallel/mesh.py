"""Multi-chip execution: device meshes and the sharded mapping step.

The reference scales three ways (SURVEY.md §2.2): pthreads inside a process,
reference-block streaming against a resident reads index, and cluster-level
data parallelism over read blocks via generated shell scripts
(HPC.damapper.c).  The TPU-native equivalents here:

  * axis "dp"  — read/seed data parallelism (the reference's thread + cluster
                 parallelism): each device owns a shard of the seed batch.
  * axis "ref" — reference k-mer index sharding (the reference's block
                 streaming, damapper.c:835-864): each device owns a slice of
                 the sorted index; per-shard hit counts are combined with
                 psum over ICI instead of the coff-cache accumulation.

`sharded_map_step` is the canonical multi-chip step: count seed hits against
the local index shard (psum over "ref"), run the batched wave kernel on the
local seed shard, and all_gather alignment extents over "dp" so every host
can report its reads.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import wave_jax
from ..ops.spec import AlignSpec, new_align_spec


def make_mesh(n_devices: int | None = None, ref_shards: int | None = None
              ) -> Mesh:
    """Build a (dp, ref) mesh over the available devices."""
    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    devs = devs[:n]
    if ref_shards is None:
        ref_shards = 2 if n % 2 == 0 and n >= 4 else 1
    dp = n // ref_shards
    arr = np.array(devs).reshape(dp, ref_shards)
    return Mesh(arr, ("dp", "ref"))


def build_sharded_step(mesh: Mesh, spec: AlignSpec, band_cap: int = 64,
                       pool_cap: int = 256):
    """Return a jitted multi-chip mapping step.

    Inputs (global shapes):
      ref_codes : uint64[R]  sorted k-mer codes, sharded over "ref"
      seed_codes: uint64[S]  query k-mer codes per seed, sharded over "dp"
      abase/bbase/mida/k0: int32[S] seed instances, sharded over "dp"
      seqmem    : uint8[L]   sequence memory, replicated

    Per step: (1) count exact k-mer hits of each seed code in the local index
    shard and psum over "ref" (ICI collective), (2) run the forward wave on
    the local "dp" shard of seeds, (3) all_gather the per-seed alignment
    extents over "dp".
    """
    fwd = wave_jax._mk_kernel(band_cap, pool_cap, reverse=False)
    consts = (jnp.int32(spec.trace_space), jnp.int32(spec.ave_path),
              jnp.int32(spec.mscore), jnp.int32(spec.dscore))

    def local_step(ref_codes, seed_codes, abase, bbase, mida, k0, seqmem):
        # (1) index lookup on the local reference shard + psum over "ref"
        lo = jnp.searchsorted(ref_codes, seed_codes, side="left")
        hi = jnp.searchsorted(ref_codes, seed_codes, side="right")
        counts = (hi - lo).astype(jnp.int32)
        counts = jax.lax.psum(counts, "ref")

        # (2) the hot kernel on the local seed shard
        zeros = jnp.zeros_like(abase)
        out = jax.vmap(
            lambda ab, bb, md, kk: fwd(ab, bb, md, kk, zeros[0], zeros[0],
                                       seqmem, seqmem, *consts)
        )(abase, bbase, mida, k0)
        extent = out["trima"] - mida        # how far each seed extended

        # (3) gather per-seed results across the data-parallel axis
        all_extent = jax.lax.all_gather(extent, "dp", tiled=True)
        all_counts = jax.lax.all_gather(counts, "dp", tiled=True)
        return all_extent, all_counts

    step = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P("ref"), P("dp"), P("dp"), P("dp"), P("dp"), P("dp"),
                  P()),
        out_specs=(P(), P()),
        check_vma=False)
    return jax.jit(step)


def demo_inputs(mesh: Mesh, seeds_per_dev: int = 2, glen: int = 2000,
                seed: int = 0):
    """Tiny, correctly-sharded inputs for a dry-run step."""
    dp = mesh.shape["dp"]
    ref = mesh.shape["ref"]
    rng = np.random.default_rng(seed)

    nseeds_total = dp * seeds_per_dev
    seqlen = glen + 4 + nseeds_total * 513 + 4
    genome = rng.integers(0, 4, glen).astype(np.uint8)
    seqmem = np.full(seqlen, 4, np.uint8)
    seqmem[1:1 + glen] = genome
    roff = 2 + glen
    # reads: exact copies of genome windows (tiny smoke data)
    nseeds = dp * seeds_per_dev
    abase = np.full(nseeds, 1, np.int32)
    bbase = np.zeros(nseeds, np.int32)
    mida = np.zeros(nseeds, np.int32)
    k0 = np.zeros(nseeds, np.int32)
    pos = roff
    for i in range(nseeds):
        st = int(rng.integers(0, glen - 600))
        frag = genome[st:st + 512]
        seqmem[pos:pos + 512] = frag
        bbase[i] = pos
        apos, bpos = st + 256, 256
        mida[i] = apos + bpos
        k0[i] = apos - bpos
        pos += 513
    ref_codes = np.sort(rng.integers(0, 1 << 40, 1024 * ref).astype(np.uint64))
    seed_codes = rng.integers(0, 1 << 40, nseeds).astype(np.uint64)

    def shard(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    return (shard(ref_codes, P("ref")), shard(seed_codes, P("dp")),
            shard(abase, P("dp")), shard(bbase, P("dp")),
            shard(mida, P("dp")), shard(k0, P("dp")),
            shard(jnp.asarray(seqmem), P()))


def dryrun(n_devices: int) -> None:
    """Compile + execute one sharded step on an n-device mesh (the driver's
    multichip validation entry; see __graft_entry__.dryrun_multichip)."""
    mesh = make_mesh(n_devices)
    spec = new_align_spec(.85, 100, [.25, .25, .25, .25], True)
    step = build_sharded_step(mesh, spec)
    args = demo_inputs(mesh)
    extent, counts = step(*args)
    extent.block_until_ready()
    assert extent.shape[0] == mesh.shape["dp"] * 2
    assert (np.asarray(extent) >= 0).any()
