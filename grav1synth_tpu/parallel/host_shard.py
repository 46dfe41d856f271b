"""Multi-process sharded inspect: GOP-parallel header extraction.

The reference's packet loop is single-threaded; here the video time
axis is sharded across worker processes (one per host/core), each
walking its own keyframe-aligned packet range with a self-contained
parser, and the per-shard aggregates merge associatively
(tables.merge_segment_runs) into the exact single-pass result.

Shard boundaries must sit on keyframes: an AV1 keyframe resets the
reference slots, making the header walk independent of earlier GOPs
(SURVEY §5 — the only cross-frame couplings are GOP-local). IVF files
carry no keyframe flags, so boundaries are discovered with a cheap OBU
probe of each packet's first frame header.
"""

from __future__ import annotations

import multiprocessing as mp
from typing import List, Optional, Sequence, Tuple

from ..container import ivf
from ..obu import Av1Parser, GrainAction
from ..obu.types import GrainTableSegment
from ..tables import aggregate_grain_headers, merge_segment_runs


def keyframe_flags(packets: Sequence[ivf.IvfPacket]) -> List[bool]:
    """True for packets whose first frame is a shown keyframe (probed
    with a full parser walk — cheap, headers only)."""
    parser = Av1Parser()
    flags = []
    for p in packets:
        is_key = False
        try:
            for obu in parser.parse_packet(p.data, 0):
                if obu.frame is not None:
                    from ..obu.types import FrameType

                    is_key = (
                        obu.frame.frame_type == FrameType.KEY
                        and obu.frame.show_frame
                        and not obu.frame.show_existing_frame
                    )
                    break
        except Exception:
            is_key = False
        flags.append(is_key)
    return flags


def plan_shards(
    keyframes: Sequence[bool], n_shards: int
) -> List[Tuple[int, int]]:
    """Contiguous packet ranges starting at keyframes, balanced to
    roughly equal frame counts."""
    n = len(keyframes)
    key_idx = [i for i, k in enumerate(keyframes) if k]
    if not key_idx or key_idx[0] != 0:
        return [(0, n)]  # no safe split points: single shard
    target = max(1, n // n_shards)
    bounds = [0]
    for k in key_idx[1:]:
        if k - bounds[-1] >= target and len(bounds) < n_shards:
            bounds.append(k)
    bounds.append(n)
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
