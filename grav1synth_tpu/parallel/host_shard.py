"""Multi-process sharded inspect/rewrite: GOP-parallel packet work.

The reference's packet loop is single-threaded; here the video time
axis is sharded across worker processes (one per host/core), each
walking its own keyframe-aligned packet range with a self-contained
parser. Inspect merges per-shard aggregates associatively
(tables.merge_segment_runs) into the exact single-pass result; rewrite
produces the exact single-pass output BYTES regardless of shard count
by prefix-summing the per-segment seed-decorrelation counters across
shards (SURVEY §7 hard part 6: per-frame seed mutation must not depend
on loop order).

Shard boundaries must sit on keyframes: an AV1 keyframe resets the
reference slots, making the header walk independent of earlier GOPs
(SURVEY §5 — the only cross-frame couplings are GOP-local). IVF files
carry no keyframe flags, so boundaries are discovered with a cheap OBU
probe of each packet's first frame header.
"""

from __future__ import annotations

import logging
import multiprocessing as mp
from typing import List, Optional, Sequence, Tuple

log = logging.getLogger("grav1synth")

from ..container import ivf
from ..obu import Av1Parser, GrainAction, GrainRewriter
from ..obu.types import GrainTableSegment
from ..tables import aggregate_grain_headers, merge_segment_runs


def _av1_ts(pts: int, tb_num: int, tb_den: int) -> int:
    """pts -> 1/10^7-s ticks, ceiling (same rule as pipelines)."""
    if pts < 0 or tb_den == 0:
        return 0
    return -(-pts * tb_num * 10_000_000 // tb_den)


def _probe_packet_keyframe(data: bytes, seq_box: list) -> bool:
    """Cheap keyframe probe: walks only the OBU framing and the first
    frame header's leading bits (show_existing_frame / frame_type /
    show_frame) — no full uncompressed_header walk, so the pre-shard
    scan costs O(OBU count), not a second parse pass. ``seq_box`` is a
    one-element mutable holder of the current SequenceHeader (sequence
    OBUs still parse fully; they are rare and the probe needs
    reduced_still_picture_header)."""
    from ..bitio import BitReader
    from ..obu.sequence import parse_sequence_header
    from ..obu.types import ObuType

    pos = 0
    n = len(data)
    while pos < n:
        r = BitReader(data, start_bit=pos * 8)
        r.zero_bit()
        obu_type = ObuType(r.f(4))
        ext = r.bool_()
        has_size = r.bool_()
        r.zero_bit()
        if ext:
            r.f(8)
        size = r.leb128() if has_size else n - r.byte_pos()
        payload_start = r.byte_pos()
        payload_end = payload_start + size
        if payload_end > n:
            raise ValueError("OBU size overruns packet")
        if obu_type == ObuType.SEQUENCE_HEADER:
            r.end = payload_end * 8
            seq_box[0] = parse_sequence_header(r, payload_start * 8)
        elif obu_type in (ObuType.FRAME, ObuType.FRAME_HEADER):
            seq = seq_box[0]
            if seq is None:
                return False
            if seq.reduced_still_picture_header:
                return True  # frame_type = KEY, show_frame = 1
            if r.bool_():  # show_existing_frame
                return False
            frame_type = r.f(2)
            show_frame = r.bool_()
            return frame_type == 0 and show_frame
        pos = payload_end
    return False


def keyframe_flags(packets: Sequence[ivf.IvfPacket]) -> List[bool]:
    """True for packets whose first frame is a shown keyframe."""
    seq_box: list = [None]
    flags = []
    for p in packets:
        try:
            flags.append(_probe_packet_keyframe(p.data, seq_box))
        except Exception:
            flags.append(False)
    return flags


def plan_shards(
    keyframes: Sequence[bool], n_shards: int
) -> List[Tuple[int, int]]:
    """Contiguous packet ranges starting at keyframes, balanced to
    roughly equal frame counts."""
    n = len(keyframes)
    key_idx = [i for i, k in enumerate(keyframes) if k]
    if not key_idx or key_idx[0] != 0:
        # no safe split points: single shard (tell the user, who asked
        # for parallelism and would otherwise never learn it was
        # abandoned)
        log.warning(
            "stream has no keyframe-aligned split points "
            "(first packet is not a keyframe); proceeding with 1 shard"
        )
        return [(0, n)]
    target = max(1, n // n_shards)
    bounds = [0]
    for k in key_idx[1:]:
        if k - bounds[-1] >= target and len(bounds) < n_shards:
            bounds.append(k)
    bounds.append(n)
    if len(bounds) - 1 < n_shards:
        log.info(
            "keyframe spacing admits %d shard(s) of the %d requested",
            len(bounds) - 1,
            n_shards,
        )
    return [(bounds[i], bounds[i + 1]) for i in range(len(bounds) - 1)]


def _inspect_shard(args) -> Tuple[int, list]:
    path, start, end, fps_num, fps_den, frame_offset = args
    _, packets = ivf.read_ivf(path)
    parser = Av1Parser()
    headers = []
    for p in packets[start:end]:
        ts = 0  # timestamps don't influence read-only parsing
        for obu in parser.parse_packet(p.data, ts):
            if obu.frame is not None and obu.frame.show_frame:
                headers.append(obu.frame.grain)
    segs = aggregate_grain_headers(
        headers, fps_num, fps_den, start_index=frame_offset
    )
    return len(headers), segs


def sharded_inspect_ivf(
    path: str,
    n_shards: int = 4,
    fps: Optional[Tuple[int, int]] = None,
) -> Optional[List[GrainTableSegment]]:
    """Parallel inspect of an IVF file. Returns merged segments, or None
    when the stream carries no grain (matching pipelines.inspect)."""
    header, packets = ivf.read_ivf(path)
    if fps is None:
        fps = (header.timebase_den, header.timebase_num)
    flags = keyframe_flags(packets)
    shards = plan_shards(flags, n_shards)

    # frame offsets assume one shown frame per packet, which holds for
    # IVF (each temporal unit = one shown frame); shards re-count and
    # the merge validates adjacency
    jobs = []
    offset = 0
    for s, e in shards:
        jobs.append((path, s, e, fps[0], fps[1], offset))
        offset += e - s

    if len(jobs) == 1:
        results = [_inspect_shard(jobs[0])]
    else:
        with mp.get_context("spawn").Pool(len(jobs)) as pool:
            results = pool.map(_inspect_shard, jobs)

    runs = [segs for _, segs in results]
    merged = merge_segment_runs(runs)
    if not merged:
        return None
    return merged


# ---------------------------------------------------------------------------
# Sharded rewrite (apply / remove)


def _prime_parser(parser: Av1Parser, packets, upto: int) -> None:
    """Feed leading packets until the stream's sequence header is seen —
    shards that start mid-stream still need it for the header walk."""
    for p in packets[:upto]:
        parser.parse_packet(p.data, 0)
        if parser.sequence_header is not None:
            return


def _rewrite_shard(args):
    """Rewrite one keyframe-aligned packet range. Returns (bytes list,
    per-segment match-count deltas). Deltas depend only on timestamps
    and frame headers — never on the initial counts — so a zero-init
    pass yields correct deltas for the cross-shard prefix sum."""
    path, start, end, segments, init_counts = args
    header, packets = ivf.read_ivf(path)
    tb_num, tb_den = header.time_base
    parser = Av1Parser()
    if start > 0:
        _prime_parser(parser, packets, start)
    rw = GrainRewriter(segments)
    if init_counts is not None:
        rw.set_match_counts(init_counts)
    out = []
    for p in packets[start:end]:
        ts = _av1_ts(p.pts, tb_num, tb_den)
        parsed = parser.parse_packet(p.data, ts)
        out.append(rw.rewrite_packet(p.data, parsed, ts, parser.sequence_header))
    return out, rw.seed_match_counts()


def sharded_rewrite_ivf(
    path: str,
    out_path: str,
    segments: Optional[List[GrainTableSegment]],
    n_shards: int = 4,
) -> int:
    """Parallel apply/remove over an IVF file, byte-identical to the
    single-pass pipeline for any shard count.

    The per-frame seed decorrelation counts segment matches in frame
    order, so shard i must start from the counts accumulated by shards
    < i. Phase 1 runs every shard with zero counts (correct for shard
    0, and it yields each shard's count DELTAS, which are
    init-independent); shards whose prefix sum is nonzero re-run with
    the proper initial counts. Removal (segments=None) has no counters
    and finishes in one phase."""
    header, packets = ivf.read_ivf(path)
    flags = keyframe_flags(packets)
    shards = plan_shards(flags, n_shards)

    jobs = [(path, s, e, segments, None) for s, e in shards]
    if len(jobs) == 1:
        results = [_rewrite_shard(jobs[0])]
    else:
        with mp.get_context("spawn").Pool(len(jobs)) as pool:
            results = pool.map(_rewrite_shard, jobs)

    outs = [r[0] for r in results]
    if segments:
        n_seg = len(segments)
        prefix = [0] * n_seg
        redo = []
        prefixes = {}
        for i, (_, delta) in enumerate(results):
            if i > 0 and any(prefix):
                prefixes[i] = list(prefix)
                redo.append(i)
            prefix = [a + b for a, b in zip(prefix, delta)]
        if redo:
            jobs2 = [
                (path, shards[i][0], shards[i][1], segments, prefixes[i])
                for i in redo
            ]
            if len(jobs2) == 1:
                fixed = [_rewrite_shard(jobs2[0])]
            else:
                with mp.get_context("spawn").Pool(len(jobs2)) as pool:
                    fixed = pool.map(_rewrite_shard, jobs2)
            for i, r in zip(redo, fixed):
                outs[i] = r[0]

    flat = [d for shard_out in outs for d in shard_out]
    ivf.write_ivf(
        out_path, header, [ivf.IvfPacket(p.pts, d) for p, d in zip(packets, flat)]
    )
    return len(flat)
