"""Sharded (data-parallel) Tamp compression over a JAX device mesh.

Container format (``TTPU``): independent Tamp streams, one per shard, with a
small host-side frame recording shard boundaries (the Tamp spec delegates
framing to the container layer).  Any single shard is a spec-conforming Tamp
stream decodable by any Tamp implementation.

    magic   b"TTPU"
    u8      container version (2; v1 still read)
    u8      reserved (0)
    u32le   shard count
    u64le   raw (uncompressed) size
    u64le   shard size (v2 only: raw bytes per shard, last may be short)
    u32le * shard compressed sizes
    bytes   concatenated Tamp streams
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "make_mesh",
    "sharded_search_step",
    "compress_sharded",
    "decompress_sharded",
    "decompress_sharded_device",
    "compress_file_sharded",
    "decompress_file_sharded",
    "DEFAULT_SHARD_SIZE",
]

MAGIC = b"TTPU"
DEFAULT_SHARD_SIZE = 1 << 20


def _pack_frame(blobs, raw_size: int, shard_size: int) -> bytes:
    """TTPU v2 frame: records shard_size so decoders can place every
    shard's output at ``i * shard_size`` without decoding in order."""
    head = MAGIC + struct.pack("<BBIQQ", 2, 0, len(blobs), raw_size, shard_size)
    sizes = struct.pack(f"<{len(blobs)}I", *(len(b) for b in blobs))
    return head + sizes + b"".join(blobs)


def _parse_frame(blob):
    """-> (raw_size, shard_size | None, pieces).  Reads v1 (no shard_size)
    and v2 frames."""
    if blob[:4] != MAGIC:
        raise ValueError("not a TTPU container")
    ver, _res, n, raw_size = struct.unpack_from("<BBIQ", blob, 4)
    off = 4 + 14
    shard_size = None
    if ver == 2:
        (shard_size,) = struct.unpack_from("<Q", blob, off)
        off += 8
    elif ver != 1:
        raise ValueError(f"unsupported TTPU version {ver}")
    sizes = struct.unpack_from(f"<{n}I", blob, off)
    off += 4 * n
    pieces = []
    for sz in sizes:
        pieces.append(blob[off : off + sz])
        off += sz
    return raw_size, shard_size, pieces


def make_mesh(n_devices: int | None = None, axis: str = "dp"):
    """A 1-D device mesh for data-parallel stream compression."""
    import jax
    from jax.sharding import Mesh

    if n_devices is not None:
        # Pre-provision virtual CPU devices so sharding logic can always be
        # exercised even on a 1-chip (or 0-chip) host; must happen before the
        # backend initializes, hence before the first jax.devices() call.
        try:
            jax.config.update("jax_num_cpu_devices", n_devices)
        except Exception:
            pass  # backend already initialized (e.g. under tests' 8-dev CPU)
    devs = jax.devices()
    if n_devices is not None and n_devices > len(devs):
        try:
            devs = jax.devices("cpu")
        except RuntimeError:
            pass
    if n_devices is not None:
        if n_devices > len(devs):
            raise ValueError(f"requested {n_devices} devices, have {len(devs)}")
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def sharded_search_step(mesh, data: np.ndarray, window_bits: int, literal_bits: int):
    """One data-parallel device step: per-shard match search + cost estimate.

    ``data`` is (n_shards, shard_len) uint8 with n_shards divisible by the
    mesh size.  Returns per-shard match tables (sharded over the mesh) and a
    replicated ``psum`` estimate of total compressed bits — the device-side
    portion of the encode pipeline, with real dp shardings and a collective.
    """
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..constants import compute_min_pattern_size
    from ..dictionary import dictionary_array
    from ..ops.match_mxu import mxu_chunk
    from ..engine.search_np import LMAX

    S, L = data.shape
    W = 1 << window_bits
    minp = compute_min_pattern_size(window_bits, literal_bits)
    extra = 3 * LMAX + 2
    dict_arr = dictionary_array(W, literal=literal_bits)

    # Host-side model history per shard (C = dict || data, sentinel-padded).
    C = np.full((S, W + L + extra), -1, dtype=np.int16)
    C[:, :W] = dict_arr
    C[:, W : W + L] = data
    rows = np.full((S, L + extra), 0x1FF, dtype=np.int16)
    rows[:, :L] = data

    axis = mesh.axis_names[0]
    match_bits = 2 + window_bits  # cheapest match token (huffman "0" + offset)

    def per_shard(C_row, d_row):
        _l15, _i15, len16, idx16 = mxu_chunk(C_row, d_row, 0, window_bits, L, False)
        # Density-based compressed-size estimate: each position contributes
        # the cheaper of a literal or its share of a cheapest-rate match.
        lit_cost = jnp.float32(1 + literal_bits)
        mlen = jnp.maximum(len16, 1).astype(jnp.float32)
        mcost = jnp.where(len16 >= minp, jnp.float32(match_bits) / mlen, lit_cost)
        est = jnp.sum(jnp.minimum(mcost, lit_cost)) + 8.0  # + header byte
        return len16, idx16, est

    def step(C_all, d_all):
        len16, idx16, est = jax.vmap(per_shard)(C_all, d_all)
        total = jax.lax.psum(jnp.sum(est), axis)
        return len16, idx16, total

    fn = shard_map(
        step,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P()),
    )
    len16, idx16, total = jax.jit(fn)(jnp.asarray(C), jnp.asarray(rows))
    return {"len16": len16, "idx16": idx16, "est_bits_total": total}


def sharded_decode_step(mesh, streams, *, max_out: int):
    """One data-parallel device decode step over a mesh.

    ``streams`` is a list of same-config Tamp streams, one per mesh device
    (or a multiple); each device runs the wavefront kernel on its shards
    under ``shard_map``, and the decoded byte total is combined with a
    ``psum`` — the decode half of the scale-out story (dp is the format's
    only parallel axis; SURVEY.md §2.8).  Returns (decoded (S, max_out)
    uint8 sharded over the mesh, lengths (S,), replicated total).
    """
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..dictionary import dictionary_array
    from ..ops.decode_wavefront import (
        _pow2_bucket, _wavefront_kernel,
    )
    import functools

    h = streams[0][0]
    window = (h >> 5) + 8
    literal = ((h >> 3) & 3) + 5
    extended = bool((h >> 1) & 1)
    more = bool(h & 1)
    skip = 2 if more else 1
    payloads = [bytes(s[skip:]) for s in streams]
    S = len(payloads)
    L = _pow2_bucket(max(len(p) for p in payloads), 64)
    blobs = np.zeros((S, L + 8), np.uint32)
    nbytes = np.zeros(S, np.int32)
    for i, p in enumerate(payloads):
        blobs[i, : len(p)] = np.frombuffer(p, np.uint8)
        nbytes[i] = len(p)
    dict_init = jnp.asarray(
        dictionary_array(1 << window, literal=literal if extended else 8)
        .astype(np.int32))

    axis = mesh.axis_names[0]
    kern = functools.partial(
        _wavefront_kernel, NBP=8 * L, window=window, literal=literal,
        extended=extended, more=more, max_out=_pow2_bucket(max_out, 1024))

    def step(blob_all, nb_all):
        outs, lens, errs = jax.vmap(
            lambda b, n: kern(b, n, dict_init, dict_init))(blob_all, nb_all)
        total = jax.lax.psum(jnp.sum(lens), axis)
        return outs.astype(jnp.uint8), lens, errs, total

    fn = shard_map(
        step, mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis), P()),
    )
    outs, lens, errs, total = jax.jit(fn)(jnp.asarray(blobs), jnp.asarray(nbytes))
    if np.asarray(errs).any():
        raise ValueError("invalid tamp stream in sharded decode")
    return outs, lens, total


def _encode_one_shard(args):
    data, window, literal, extended, lazy, engine, dictionary = args
    if engine == "optimal":
        # minimum-bit parse per shard (lazy flag does not apply)
        if extended:
            from ..engine.encode import encode_extended_optimal

            return encode_extended_optimal(
                data, window=window, literal=literal, dictionary=dictionary)
        from ..engine.encode import encode_v1

        return encode_v1(data, window=window, literal=literal,
                         parse="optimal", dictionary=dictionary)
    if engine == "device":
        from ..engine.pipeline import device_pipeline_available, encode_device

        if device_pipeline_available():
            return encode_device(
                data, window=window, literal=literal, extended=extended,
                lazy_matching=lazy, dictionary=dictionary,
            )
        engine = "native"
    if engine == "native":
        from .. import _native

        if _native.available():
            return _native.native_compress(
                data, window=window, literal=literal, extended=extended,
                lazy_matching=lazy, dictionary=dictionary,
            )
        # No toolchain: the streaming Python codec beats the NumPy-oracle
        # tables path by an order of magnitude.
        from ..compressor import compress as py_compress

        return py_compress(
            bytes(data), window=window, literal=literal, extended=extended,
            lazy_matching=lazy, dictionary=dictionary,
        )
    from ..engine.encode import encode_v1

    if extended:
        from ..engine.encode_extended import encode_extended

        return encode_extended(data, window=window, literal=literal,
                               lazy_matching=lazy, dictionary=dictionary)
    return encode_v1(data, window=window, literal=literal,
                     lazy_matching=lazy, dictionary=dictionary)


def compress_sharded(
    data: bytes,
    *,
    window: int = 10,
    literal: int = 8,
    extended: bool = True,
    lazy_matching: bool = False,
    dictionary: bytes | None = None,
    shard_size: int = DEFAULT_SHARD_SIZE,
    workers: int | None = None,
    engine: str = "native",
) -> bytes:
    """Compress ``data`` as a TTPU container of independent Tamp streams.

    ``engine="native"`` (default, fastest) uses the standalone C++ codec
    per shard; ``"tables"`` routes each shard through the vectorized engine
    (search tables + native commit); ``"device"`` puts the search on the
    TPU.  Host work runs in a thread pool — the native codec releases the
    GIL for the whole call via ctypes.  ``dictionary`` (a full-window
    custom dictionary) seeds every shard's window; pass the same one to
    the decode side.
    """
    if workers is None:
        import os

        workers = (os.cpu_count() or 4) + 2
    from concurrent.futures import ThreadPoolExecutor

    data = bytes(data)
    shards = [data[i : i + shard_size] for i in range(0, len(data), shard_size)] or [b""]
    if engine == "device-greedy":
        # Reference-greedy hybrid: Pallas search tables + native
        # exact-table commit — byte-identical to the REFERENCE encoder
        # per shard (engine/pipeline_ext.encode_ext_device_greedy).
        if not extended:
            raise ValueError("device-greedy is the extended-format mode; "
                             "v1 engine='device-commit' is already "
                             "reference-exact")
        from ..engine.pipeline_ext import encode_ext_device_greedy

        blobs = encode_ext_device_greedy(
            shards, window=window, literal=literal,
            lazy_matching=lazy_matching, dictionary=dictionary)
        return _pack_frame(blobs, len(data), shard_size)
    if engine == "device-optimal":
        # Minimum-bit parse with the DP on the device: v1 is fully
        # on-chip (engine/pipeline.encode_v1_device_optimal, byte-equal to
        # encode_v1(parse="optimal")); extended runs the full-lookback
        # blocked min-plus DP on the device with host tables/emit
        # (engine/pipeline_ext.encode_ext_device_optimal, byte-equal to
        # encode_extended_optimal).
        if extended:
            from ..engine.pipeline_ext import encode_ext_device_optimal

            blobs = encode_ext_device_optimal(
                shards, window=window, literal=literal,
                dictionary=dictionary)
        else:
            from ..engine.pipeline import encode_v1_device_optimal

            blobs = encode_v1_device_optimal(
                shards, window=window, literal=literal,
                dictionary=dictionary)
        return _pack_frame(blobs, len(data), shard_size)
    if engine == "device-commit":
        # Fully on-chip encode: MXU search + Pallas planned-fields commit,
        # all shards batched (engine/pipeline, engine/pipeline_ext).
        # v1 output is byte-identical to engine="native"; extended output
        # is byte-identical to the native planned committer
        # (force_planned=True, avoid_divergence=True) — a valid stream
        # every Tamp decoder accepts.
        from ..ops.encode_commit_pallas import encode_commit_available
        from ..ops.match_pallas import pallas_available

        have_kernels = encode_commit_available() and pallas_available()
        if extended:
            from ..ops.plan_ext import MAX_PLAN_WINDOW

            if window > MAX_PLAN_WINDOW:
                raise ValueError(
                    f"device-commit extended supports window <= "
                    f"{MAX_PLAN_WINDOW}; use engine='native'")
            from ..engine.pipeline_ext import encode_ext_device_commit

            search = None
            if have_kernels:
                from ..engine.pipeline import device_search_fn

                search = device_search_fn(window, literal, True)
            blobs = encode_ext_device_commit(
                shards, window=window, literal=literal,
                lazy_matching=lazy_matching, dictionary=dictionary,
                search_fn=search)
            return _pack_frame(blobs, len(data), shard_size)
        from ..engine.pipeline import encode_v1_device_commit

        search = None
        if have_kernels:
            from ..engine.pipeline import device_search_fn

            search = device_search_fn(window, literal, False)
        blobs = encode_v1_device_commit(
            shards, window=window, literal=literal,
            lazy_matching=lazy_matching, dictionary=dictionary,
            search_fn=search)
        return _pack_frame(blobs, len(data), shard_size)
    jobs = [(s, window, literal, extended, lazy_matching, engine, dictionary)
            for s in shards]
    if workers and len(shards) > 1:
        with ThreadPoolExecutor(max_workers=workers) as ex:
            blobs = list(ex.map(_encode_one_shard, jobs))
    else:
        blobs = [_encode_one_shard(j) for j in jobs]

    return _pack_frame(blobs, len(data), shard_size)


def compress_file_sharded(
    src,
    dst,
    *,
    window: int = 10,
    literal: int = 8,
    extended: bool = True,
    lazy_matching: bool = False,
    dictionary: bytes | None = None,
    shard_size: int = DEFAULT_SHARD_SIZE,
    workers: int | None = None,
    engine: str = "native",
) -> int:
    """Bounded-memory TTPU compression of a file (files larger than RAM).

    Reads ``src`` shard-by-shard, encodes on a thread pool with a bounded
    in-flight window (memory ~ 2·workers·shard_size), and streams the
    container to ``dst``: the frame header and a zeroed sizes table go out
    first and the sizes are patched in place at the end, so ``dst`` must be
    seekable (a path or a binary file).  The output is byte-identical to
    ``compress_sharded`` on the whole file.  Returns bytes written.
    """
    import os
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    if engine == "device-commit":
        raise ValueError(
            "device-commit batches whole containers; use compress_sharded, "
            "or engine='device' for the per-shard device search pipeline")
    if workers is None:
        workers = (os.cpu_count() or 4) + 2
    close_src = close_dst = False
    if not hasattr(src, "read"):
        src, close_src = open(str(src), "rb"), True
    if not hasattr(dst, "write"):
        dst, close_dst = open(str(dst), "wb"), True
    try:
        pos0 = src.tell()
        raw_size = src.seek(0, 2) - pos0
        src.seek(pos0)
        n_shards = max(1, -(-raw_size // shard_size))
        head_at = dst.tell()
        dst.write(MAGIC + struct.pack(
            "<BBIQQ", 2, 0, n_shards, raw_size, shard_size))
        sizes_at = dst.tell()
        dst.write(b"\x00" * (4 * n_shards))

        sizes = []

        def read_jobs():
            for _ in range(n_shards):
                s = src.read(shard_size)
                yield (s, window, literal, extended, lazy_matching, engine,
                       dictionary)

        with ThreadPoolExecutor(max_workers=workers) as ex:
            pending: deque = deque()
            jobs = read_jobs()
            for job in jobs:
                pending.append(ex.submit(_encode_one_shard, job))
                if len(pending) >= 2 * workers:  # bound reads AND results
                    blob = pending.popleft().result()
                    sizes.append(len(blob))
                    dst.write(blob)
            while pending:
                blob = pending.popleft().result()
                sizes.append(len(blob))
                dst.write(blob)

        end_at = dst.tell()
        dst.seek(sizes_at)
        dst.write(struct.pack(f"<{n_shards}I", *sizes))
        dst.seek(end_at)
        return end_at - head_at
    finally:
        if close_src:
            src.close()
        if close_dst:
            dst.close()


def decompress_file_sharded(src, dst, workers: int | None = None,
                            dictionary: bytes | None = None) -> int:
    """Bounded-memory TTPU decompression of a file.

    Reads the frame header, then decodes shards on a thread pool with a
    bounded in-flight window, writing decoded shards to ``dst`` in order
    (memory ~ 2·workers·(shard_size + compressed)).  Returns bytes written.
    """
    import os
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    from .. import _native

    if workers is None:
        workers = os.cpu_count() or 4
    close_src = close_dst = False
    if not hasattr(src, "read"):
        src, close_src = open(str(src), "rb"), True
    if not hasattr(dst, "write"):
        dst, close_dst = open(str(dst), "wb"), True
    try:
        head = src.read(18)
        if head[:4] != MAGIC:
            raise ValueError("not a TTPU container")
        ver, _res, n, raw_size = struct.unpack_from("<BBIQ", head, 4)
        if ver == 2:
            src.read(8)  # shard_size: unused (in-order writes)
        elif ver != 1:
            raise ValueError(f"unsupported TTPU version {ver}")
        sizes = struct.unpack(f"<{n}I", src.read(4 * n))

        if _native.available():
            def decode(p):
                return _native.native_decompress(p, dictionary=dictionary)
        else:
            from ..decompressor import decompress as _py_decode

            def decode(p):
                return _py_decode(
                    p,
                    dictionary=bytearray(dictionary) if dictionary else None)

        written = 0
        with ThreadPoolExecutor(max_workers=workers) as ex:
            pending: deque = deque()
            for sz in sizes:
                pending.append(ex.submit(decode, src.read(sz)))
                if len(pending) >= 2 * workers:
                    d = pending.popleft().result()
                    written += len(d)
                    dst.write(d)
            while pending:
                d = pending.popleft().result()
                written += len(d)
                dst.write(d)
        if written != raw_size:
            raise ValueError("container raw-size mismatch")
        return written
    finally:
        if close_src:
            src.close()
        if close_dst:
            dst.close()


def decompress_sharded(blob: bytes, workers: int | None = None,
                       dictionary: bytes | None = None) -> bytearray:
    """Decode a TTPU container (shards decoded independently, in order;
    decoded in parallel through the native decoder when available).

    v2 containers decode zero-copy: one output buffer is allocated up
    front and every worker's native decoder writes its shard directly
    into its ``i * shard_size`` slice (ordered gather with no
    concatenation pass).  ``dictionary`` must match the encode side's."""
    raw_size, shard_size, pieces = _parse_frame(blob)

    from .. import _native

    if workers is None:
        import os

        workers = os.cpu_count()

    if _native.available() and shard_size is not None:
        out = bytearray(raw_size)
        view = np.frombuffer(out, dtype=np.uint8)

        def job(i: int) -> None:
            start = i * shard_size
            end = min(start + shard_size, raw_size)
            got = _native.native_decompress_into(
                pieces[i], view[start:end], dictionary=dictionary)
            if got != end - start:
                raise ValueError("container raw-size mismatch")

        if workers and len(pieces) > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=workers) as ex:
                list(ex.map(job, range(len(pieces))))
        else:
            for i in range(len(pieces)):
                job(i)
        return out

    if _native.available():
        def decode(p):  # v1 frame: sizes unknown up front
            return _native.native_decompress(p, dictionary=dictionary)
    else:
        from ..decompressor import decompress as _py_decode

        def decode(p):
            return _py_decode(
                p, dictionary=bytearray(dictionary) if dictionary else None)
    if workers and len(pieces) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=workers) as ex:
            decoded = list(ex.map(decode, pieces))
    else:
        decoded = [decode(p) for p in pieces]
    out = bytearray()
    for d in decoded:
        out += d
    if len(out) != raw_size:
        raise ValueError("container raw-size mismatch")
    return out


def decompress_sharded_device(blob: bytes, shard_size: int | None = None,
                              algorithm: str = "wavefront",
                              dictionary: bytes | None = None) -> bytearray:
    """Decode a TTPU container on the device.

    ``algorithm="wavefront"`` (default): every decode stage is a dense
    static-shaped array op (ops.decode_wavefront) — per-bit speculative
    parse, pointer-doubling boundary/value resolution.
    ``algorithm="serial"``: the vmapped token-serial JAX decoder
    (ops.decode_jax), kept as a second independent device implementation.

    ``shard_size`` (the per-shard output bound) comes from the v2 frame;
    pass it explicitly only for v1 containers.  ``dictionary`` must match
    the encode side's.
    """
    raw_size, frame_shard_size, pieces = _parse_frame(blob)
    if shard_size is None:
        shard_size = frame_shard_size
    if shard_size is None:
        shard_size = DEFAULT_SHARD_SIZE  # v1 frame without a caller bound
    if algorithm == "wavefront":
        from ..ops.decode_wavefront import decode_shards_wavefront

        outs = decode_shards_wavefront(pieces, max_out=shard_size,
                                       dictionary=dictionary)
    elif algorithm == "serial":
        from ..ops.decode_jax import decode_shards_device

        outs = decode_shards_device(pieces, max_out=shard_size,
                                    dictionary=dictionary)
    else:
        raise ValueError(f"unknown device decode algorithm: {algorithm!r}")
    out = bytearray()
    for d in outs:
        out += d
    if len(out) != raw_size:
        raise ValueError("container raw-size mismatch")
    return out
