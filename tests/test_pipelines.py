"""End-to-end pipeline tests over real libaom-encoded IVF files.

The round-trip oracles mirror the reference's integration tier
(sanity_tests.rs): apply -> re-inspect reports grain; remove ->
re-inspect reports none; outputs stay dav1d-decodable and pixel-
lossless under grain-off decode.
"""

import numpy as np
import pytest

from av1_builder import sample_grain_params
from grav1synth_tpu import pipelines
from grav1synth_tpu.container.ffshim import Decoder, Encoder
from grav1synth_tpu.container.ivf import IvfHeader, IvfPacket, write_ivf
from grav1synth_tpu.obu import GrainTableSegment
from grav1synth_tpu.tables import dump_table, load_table


@pytest.fixture(scope="session")
def real_ivf(tmp_path_factory):
    path = tmp_path_factory.mktemp("vid") / "real.ivf"
    rng = np.random.default_rng(11)
    frames = []
    for i in range(8):
        y = (
            np.linspace(0, 200, 64)[None, :]
            + np.linspace(0, 40, 64)[:, None]
            + rng.normal(0, 3, (64, 64))
            + i * 3
        ).clip(0, 255).astype(np.uint8)
        u = np.full((32, 32), 120, np.uint8)
        v = np.full((32, 32), 130, np.uint8)
        frames.append((y, u, v))
    enc = Encoder(64, 64, 8)
    pkts = enc.encode_frames(frames)
    enc.close()
    write_ivf(
        str(path),
        IvfHeader(width=64, height=64, timebase_den=24, timebase_num=1, frame_count=len(pkts)),
        [IvfPacket(p.pts, p.data) for p in pkts],
    )
    return str(path)


@pytest.fixture()
def grain_table(tmp_path):
    path = tmp_path / "grain.tbl"
    seg = GrainTableSegment(0, 10**13, sample_grain_params(seed=4321))
    dump_table([seg], str(path))
    return str(path)


def _decode(path, apply_grain=False):
    from grav1synth_tpu.container.ivf import read_ivf

    _, pkts = read_ivf(path)
    dec = Decoder("libdav1d", apply_grain=apply_grain)
    frames = list(dec.decode_all([(p.data, p.pts) for p in pkts]))
    dec.close()
    return frames


class TestInspect:
    def test_no_grain_returns_none(self, real_ivf, tmp_path):
        out = tmp_path / "t.tbl"
        assert pipelines.inspect(real_ivf, str(out), progress=False) is None

    def test_inspect_after_apply(self, real_ivf, grain_table, tmp_path):
        grainy = tmp_path / "grainy.ivf"
        pipelines.apply_table(real_ivf, str(grainy), grain_table, progress=False)
        out = tmp_path / "t.tbl"
        segments = pipelines.inspect(str(grainy), str(out), progress=False)
        assert segments is not None and len(segments) == 1
        orig = load_table(grain_table)[0]
        got = segments[0].params
        assert got.scaling_points_y == orig.params.scaling_points_y
        assert got.ar_coeffs_y == orig.params.ar_coeffs_y
        # the table re-read round-trips through the text format
        reread = load_table(str(out))
        assert reread[0].params.equal_ignoring_seed(got)


def test_inspect_altref_display_order_grid(tmp_path):
    """Hidden alt-ref frames must NOT advance the inspect time grid
    (documented divergence from the reference, which accumulates every
    parsed frame header incl. hidden ones, parser.rs:156): on an
    alt-ref stream the table must span exactly shown_frames/fps and the
    two-segment boundary must sit at a display-time grid point."""
    from grav1synth_tpu.obu import Av1Parser

    rng = np.random.default_rng(23)
    n = 24
    fps = 24
    frames = []
    for i in range(n):
        y = (
            np.linspace(0, 200, 96)[None, :]
            + rng.normal(0, 12, (96, 96))
            + i * 4
        ).clip(0, 255).astype(np.uint8)
        u = rng.integers(100, 150, (48, 48)).astype(np.uint8)
        frames.append((y, u, u.copy()))
    enc = Encoder(
        96, 96, 8,
        extra_opts="lag-in-frames=16:auto-alt-ref=1:usage=good:cpu-used=4:crf=30",
    )
    pkts = enc.encode_frames(frames)
    enc.close()
    path = tmp_path / "alt.ivf"
    write_ivf(
        str(path),
        IvfHeader(width=96, height=96, timebase_den=fps, timebase_num=1),
        [IvfPacket(p.pts, p.data) for p in pkts],
    )
    # confirm the stream actually contains hidden frames
    parser = Av1Parser()
    total_headers = 0
    shown = 0
    from grav1synth_tpu.container.ivf import read_ivf

    _, rpkts = read_ivf(str(path))
    for p in rpkts:
        for o in parser.parse_packet(p.data, 0):
            if o.frame is not None:
                total_headers += 1
                shown += int(o.frame.show_frame or o.frame.show_existing_frame)
    assert shown == n
    assert total_headers > n, "encoder produced no hidden alt-ref frames"

    # two segments split mid-stream by display time
    tick = 10_000_000
    mid = -(-12 * tick // fps)
    p2 = sample_grain_params(seed=901)
    p2.scaling_points_y = [(0, 60), (128, 90), (255, 40)]  # distinct model:
    # aggregation ignores seeds (grain.rs:83-106), so the segments must
    # differ in substance to stay separate
    segs = [
        GrainTableSegment(0, mid, sample_grain_params(seed=5)),
        GrainTableSegment(mid, 10**14, p2),
    ]
    tbl = tmp_path / "two.tbl"
    dump_table(segs, str(tbl))
    grainy = tmp_path / "grainy.ivf"
    pipelines.apply_table(str(path), str(grainy), str(tbl), progress=False)
    got = pipelines.inspect(str(grainy), str(tmp_path / "o.tbl"), progress=False)
    assert got is not None and len(got) == 2
    # the grid counts SHOWN frames only: boundary at frame 8, end at
    # frame 16 in display time (ceil of the float grid like aggregate)
    assert got[0].start_time == 0
    boundary = got[0].end_time
    assert boundary == got[1].start_time
    import math

    assert boundary == math.ceil(12 * tick / fps)
    assert got[1].end_time == math.ceil(n * tick / fps)


class TestApplyRemove:
    def test_apply_lossless_and_decodable(self, real_ivf, grain_table, tmp_path):
        grainy = tmp_path / "grainy.ivf"
        n = pipelines.apply_table(real_ivf, str(grainy), grain_table, progress=False)
        assert n == 8
        base = _decode(real_ivf)
        nograin = _decode(str(grainy), apply_grain=False)
        withgrain = _decode(str(grainy), apply_grain=True)
        assert len(nograin) == len(withgrain) == len(base) == 8
        for a, b in zip(base, nograin):
            assert (a.planes[0] == b.planes[0]).all()
        assert any(
            (a.planes[0] != b.planes[0]).any()
            for a, b in zip(nograin, withgrain)
        )

    def test_remove_roundtrip(self, real_ivf, grain_table, tmp_path):
        grainy = tmp_path / "grainy.ivf"
        clean = tmp_path / "clean.ivf"
        pipelines.apply_table(real_ivf, str(grainy), grain_table, progress=False)
        pipelines.remove(str(grainy), str(clean), progress=False)
        out = tmp_path / "t.tbl"
        assert pipelines.inspect(str(clean), str(out), progress=False) is None
        a = _decode(str(clean), apply_grain=True)
        b = _decode(str(clean), apply_grain=False)
        for x, y in zip(a, b):
            assert (x.planes[0] == y.planes[0]).all()


class TestGenerate:
    def test_generate_iso(self, real_ivf, tmp_path):
        out = tmp_path / "iso.ivf"
        n = pipelines.generate(real_ivf, str(out), iso=1600, progress=False)
        assert n == 8
        tbl = tmp_path / "t.tbl"
        segments = pipelines.inspect(str(out), str(tbl), progress=False)
        assert segments is not None
        pts = segments[0].params.scaling_points_y
        assert len(pts) >= 4
        # dav1d synthesizes visible noise from the generated params
        nograin = _decode(str(out), apply_grain=False)
        withgrain = _decode(str(out), apply_grain=True)
        diffs = [
            (b.planes[0].astype(int) - a.planes[0].astype(int)).std()
            for a, b in zip(nograin, withgrain)
        ]
        assert max(diffs) > 0.3


class TestDiff:
    def test_diff_recovers_noise_curve(self, tmp_path):
        rng = np.random.default_rng(3)
        w = h = 128
        n = 12
        clean_frames = []
        noisy_frames = []
        for i in range(n):
            y = np.full((h, w), 60 + (i % 3), np.uint8)
            y[:, w // 2 :] = 180 + (i % 3)
            u = np.full((h // 2, w // 2), 128, np.uint8)
            v = u.copy()
            clean_frames.append((y, u, v))
            noise = rng.normal(0, 6.0, (h, w))
            yn = np.clip(y.astype(float) + noise, 0, 255).astype(np.uint8)
            noisy_frames.append((yn, u, v))
        enc = Encoder(w, h, 8, extra_opts="crf=10")
        noisy_pkts = enc.encode_frames(noisy_frames)
        enc.close()
        enc = Encoder(w, h, 8, extra_opts="crf=10")
        clean_pkts = enc.encode_frames(clean_frames)
        enc.close()
        src = tmp_path / "src.ivf"
        den = tmp_path / "den.ivf"
        hdr = IvfHeader(width=w, height=h, timebase_den=24, timebase_num=1)
        write_ivf(str(src), hdr, [IvfPacket(p.pts, p.data) for p in noisy_pkts])
        write_ivf(str(den), hdr, [IvfPacket(p.pts, p.data) for p in clean_pkts])
        out = tmp_path / "diff.tbl"
        segments = pipelines.diff(str(src), str(den), str(out), progress=False)
        assert len(segments) >= 1
        p = segments[0].params
        assert len(p.scaling_points_y) >= 2
        # noise was flat across intensity: curve should be roughly flat
        ys = [y for _, y in p.scaling_points_y]
        assert max(ys) > 0
        # batch/shard settings must not change the result (CLI --batch/
        # --shards contract): small batches and an 8-device mesh both
        # reproduce the default table byte-for-byte
        out2 = tmp_path / "diff_b3.tbl"
        pipelines.diff(
            str(src), str(den), str(out2), progress=False, batch=3
        )
        assert out2.read_bytes() == out.read_bytes()
        out3 = tmp_path / "diff_sh.tbl"
        pipelines.diff(
            str(src), str(den), str(out3), progress=False, batch=5, shards=8
        )
        assert out3.read_bytes() == out.read_bytes()


class TestDiffChroma:
    def test_diff_recovers_chroma_model(self):
        """Known grain (incl. chroma AR + scaling) injected with the
        dav1d-validated reference engine must come back from the fit:
        chroma points present, and re-synthesized chroma noise levels
        within 30% of the injected ones."""
        from grav1synth_tpu.ops import grain_ref
        from grav1synth_tpu.ops.diff_estimate import DiffEstimator
        from grav1synth_tpu.obu.types import FilmGrainParams

        # moderate, stable AR process (a near-unstable one has huge
        # seed-to-seed pattern variance no estimator can normalize out)
        true = FilmGrainParams(
            grain_seed=901,
            scaling_points_y=[(0, 40), (128, 60), (255, 80)],
            scaling_points_cb=[(0, 70), (255, 90)],
            scaling_points_cr=[(0, 30), (255, 40)],
            scaling_shift=8,
            ar_coeff_lag=2,
            ar_coeffs_y=[4, -2, 8, 2, -2, 12, 2, -1, 8, 3, 2, -4],
            ar_coeffs_cb=[3, -1, 5, 1, -1, 8, 1, -1, 5, 2, 1, -2, 24],
            ar_coeffs_cr=[2, -1, 4, 1, -1, 6, 1, 0, 4, 2, 1, -2, 16],
            ar_coeff_shift=6,
            cb_mult=192, cb_luma_mult=128, cb_offset=256,
            cr_mult=192, cr_luma_mult=128, cr_offset=256,
            overlap_flag=True,
        )
        est = DiffEstimator((24, 1), 8, 8, chunk_frames=6)
        import copy

        def frames():
            # two intensity levels per plane so the curve has >1 point
            y = np.full((128, 128), 80, np.int32)
            y[:, 64:] = 180
            cb = np.full((64, 64), 90, np.int32)
            cb[32:, :] = 150
            cr = np.full((64, 64), 110, np.int32)
            cr[32:, :] = 170
            return y, cb, cr

        for i in range(6):
            y, cb, cr = frames()
            p_i = copy.deepcopy(true)
            p_i.grain_seed = (true.grain_seed + i * 10063) & 0xFFFF
            gy, gcb, gcr = grain_ref.apply_grain_frame([y, cb, cr], p_i, 8, 1, 1)
            est.diff_frame([gy, gcb, gcr], [y, cb, cr])
        segs = est.finish()
        assert len(segs) == 1
        fit = segs[0].params
        assert fit.scaling_points_cb and fit.scaling_points_cr
        assert any(c != 0 for c in fit.ar_coeffs_cb)

        # noise-level round trip: synthesize with the fitted params on
        # the same frames and compare per-plane noise levels
        y, cb, cr = frames()
        ty, tcb, tcr = grain_ref.apply_grain_frame([y, cb, cr], true, 8, 1, 1)
        fy, fcb, fcr = grain_ref.apply_grain_frame([y, cb, cr], fit, 8, 1, 1)
        for t, f, base in ((ty, fy, y), (tcb, fcb, cb), (tcr, fcr, cr)):
            st = (t.astype(float) - base).std()
            sf = (f.astype(float) - base).std()
            assert abs(sf - st) / st < 0.30, (st, sf)


class TestDiffSceneCut:
    def test_scene_adaptive_segmentation(self):
        """A mid-stream jump in noise strength must split the table into
        two segments at that frame, without relying on the fixed chunk
        size (chunk_frames is set far beyond the stream length)."""
        from grav1synth_tpu.ops.diff_estimate import DiffEstimator
        from grav1synth_tpu.tables.aggregate import packet_bounds

        rng = np.random.default_rng(11)
        est = DiffEstimator(
            (24, 1), 8, 8, chunk_frames=1000, min_chunk_frames=6
        )
        n1 = n2 = 16
        den_y = np.full((128, 128), 120, np.int32)
        den_c = np.full((64, 64), 128, np.int32)
        for i in range(n1 + n2):
            std = 3.0 if i < n1 else 9.0
            src_y = np.clip(
                den_y + np.round(rng.normal(0, std, den_y.shape)), 0, 255
            ).astype(np.int32)
            est.diff_frame([src_y, den_c, den_c], [den_y, den_c, den_c])
        segs = est.finish()
        assert len(segs) == 2, [(s.start_time, s.end_time) for s in segs]
        cut, _ = packet_bounds(n1, 24, 1)
        assert segs[0].end_time == segs[1].start_time == cut
        y1 = max(y for _, y in segs[0].params.scaling_points_y)
        y2 = max(y for _, y in segs[1].params.scaling_points_y)
        assert y2 > y1 * 1.5, (y1, y2)

    def test_stationary_noise_single_segment(self):
        """Constant-strength noise must NOT be split even across many
        chunk boundaries (model-equality merge keeps one segment)."""
        from grav1synth_tpu.ops.diff_estimate import DiffEstimator

        rng = np.random.default_rng(12)
        est = DiffEstimator((24, 1), 8, 8, chunk_frames=8, min_chunk_frames=4)
        den_y = np.full((128, 128), 120, np.int32)
        den_c = np.full((64, 64), 128, np.int32)
        for _ in range(24):
            src_y = np.clip(
                den_y + np.round(rng.normal(0, 5.0, den_y.shape)), 0, 255
            ).astype(np.int32)
            est.diff_frame([src_y, den_c, den_c], [den_y, den_c, den_c])
        segs = est.finish()
        assert len(segs) == 1, [(s.start_time, s.end_time) for s in segs]


class TestEstimate:
    def test_estimate_single_input(self, tmp_path):
        rng = np.random.default_rng(7)
        frames = []
        for i in range(6):
            y = np.clip(
                np.full((128, 128), 100.0) + rng.normal(0, 8.0, (128, 128)), 0, 255
            ).astype(np.uint8)
            u = np.full((64, 64), 128, np.uint8)
            frames.append((y, u, u.copy()))
        enc = Encoder(128, 128, 8, extra_opts="crf=10")
        pkts = enc.encode_frames(frames)
        enc.close()
        src = tmp_path / "in.ivf"
        write_ivf(
            str(src),
            IvfHeader(width=128, height=128, timebase_den=24, timebase_num=1),
            [IvfPacket(p.pts, p.data) for p in pkts],
        )
        out = tmp_path / "est.tbl"
        raw = tmp_path / "est.raw"
        segments = pipelines.estimate(str(src), str(out), str(raw), progress=False)
        assert len(segments) == 1
        assert len(segments[0].params.scaling_points_y) >= 1
        lines = open(raw).read().splitlines()
        assert len(lines) == 6
        sigmas = [float(l.split()[1]) for l in lines]
        # injected sigma 8; encoder smooths some of it; broad sanity band
        assert 2.0 < np.mean(sigmas) < 16.0


class TestCli:
    def test_cli_inspect_apply(self, real_ivf, grain_table, tmp_path, capsys):
        from grav1synth_tpu.cli import main

        out = tmp_path / "o.ivf"
        assert main(["apply", real_ivf, "-o", str(out), "-g", grain_table, "-y"]) == 0
        tbl = tmp_path / "o.tbl"
        assert main(["inspect", str(out), "-o", str(tbl)]) == 0
        captured = capsys.readouterr().out
        assert "wrote grain table" in captured

    def test_cli_guard_same_path(self, real_ivf):
        from grav1synth_tpu.cli import main

        with pytest.raises(SystemExit):
            main(["remove", real_ivf, "-o", real_ivf])

    def test_cli_guards_all_writing_subcommands(self, real_ivf, tmp_path):
        """Reference parity (main.rs:152-171,362-368): EVERY writing
        subcommand — including inspect, diff, estimate — rejects
        input==output and refuses to overwrite without -y."""
        from grav1synth_tpu.cli import main

        for argv in (
            ["inspect", real_ivf, "-o", real_ivf],
            ["estimate", real_ivf, "-o", real_ivf],
            ["diff", real_ivf, real_ivf + ".x", "-o", real_ivf],
            ["diff", real_ivf, real_ivf, "-o", str(tmp_path / "t.tbl")],
        ):
            with pytest.raises(SystemExit):
                main(argv)
        # overwrite refusal without -y (stdin is not a tty under pytest)
        existing = tmp_path / "exists.tbl"
        existing.write_text("filmgrn1\n")
        for argv in (
            ["inspect", real_ivf, "-o", str(existing)],
            ["estimate", real_ivf, "-o", str(existing)],
            ["diff", real_ivf, real_ivf + ".x", "-o", str(existing)],
        ):
            with pytest.raises(SystemExit):
                main(argv)

    def test_cli_inspect_accepts_y(self, real_ivf, grain_table, tmp_path):
        """`inspect ... -y` parses and overwrites an existing table
        (the reference accepts -y on inspect, main.rs:160-167)."""
        from grav1synth_tpu.cli import main

        grainy = tmp_path / "g.ivf"
        assert main(["apply", real_ivf, "-o", str(grainy), "-g", grain_table, "-y"]) == 0
        tbl = tmp_path / "t.tbl"
        tbl.write_text("stale\n")
        assert main(["inspect", str(grainy), "-o", str(tbl), "-y"]) == 0
        assert tbl.read_text().startswith("filmgrn1")

    def test_cli_inspect_shards(self, real_ivf, grain_table, tmp_path):
        """inspect --shards N produces the identical table to serial."""
        from grav1synth_tpu.cli import main

        grainy = tmp_path / "g.ivf"
        assert main(["apply", real_ivf, "-o", str(grainy), "-g", grain_table, "-y"]) == 0
        t1 = tmp_path / "serial.tbl"
        t2 = tmp_path / "sharded.tbl"
        assert main(["inspect", str(grainy), "-o", str(t1)]) == 0
        assert main(["inspect", str(grainy), "-o", str(t2), "--shards", "2"]) == 0
        assert open(t1, "rb").read() == open(t2, "rb").read()


class TestMkv:
    def test_mkv_roundtrip(self, real_ivf, grain_table, tmp_path):
        """apply on an MKV container: remux keeps the stream decodable
        and the grain lands (shim demux/remux path)."""
        from grav1synth_tpu.container.ffshim import Demuxer, Remuxer

        mkv_in = tmp_path / "in.mkv"
        with Demuxer(real_ivf) as dm:
            mux = Remuxer(str(mkv_in), dm)
            for pkt in dm.packets():
                mux.write(pkt)
            mux.finish()

        mkv_out = tmp_path / "out.mkv"
        n = pipelines.apply_table(str(mkv_in), str(mkv_out), grain_table, progress=False)
        assert n == 8
        tbl = tmp_path / "t.tbl"
        segments = pipelines.inspect(str(mkv_out), str(tbl), progress=False)
        assert segments is not None and len(segments) == 1
        # decodable via the demuxer path
        from grav1synth_tpu.container.ffshim import Decoder

        with Demuxer(str(mkv_out)) as dm:
            vs = dm.best_video_stream()
            dec = Decoder("libdav1d", apply_grain=True)
            frames = list(
                dec.decode_all(
                    (p.data, p.pts) for p in dm.packets() if p.stream_index == vs
                )
            )
            dec.close()
        assert len(frames) == 8


class TestResume:
    def test_resume_after_truncation(self, real_ivf, grain_table, tmp_path):
        """Interrupting an IVF rewrite mid-file and resuming produces a
        byte-identical output to the uninterrupted run."""
        full = tmp_path / "full.ivf"
        pipelines.apply_table(real_ivf, str(full), grain_table, progress=False)
        # simulate an interrupted run: copy a truncated prefix
        partial = tmp_path / "partial.ivf"
        from grav1synth_tpu.container.ivf import scan_complete_packets

        data = open(full, "rb").read()
        # cut mid-way through the 4th packet (scan gives exact offsets)
        import io, struct

        fh = io.BytesIO(data)
        fh.seek(32)
        for _ in range(3):
            size, _pts = struct.unpack("<Iq", fh.read(12))
            fh.seek(size, 1)
        cut = fh.tell() + 7
        open(partial, "wb").write(data[:cut])
        hdr, n_done, off = scan_complete_packets(str(partial))
        assert n_done == 3
        pipelines.apply_table(
            real_ivf, str(partial), grain_table, progress=False, resume=True
        )
        assert open(partial, "rb").read() == data
