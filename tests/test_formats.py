"""Reference dataset binary format tests: v201/v100 round-trips, LowFP
quantizer properties, and score int8 packing (reference:
src/dataset/SearchDataStorage.cpp, utils/low_precision.hpp)."""

import numpy as np
import pytest

from alphagomoku_tpu.data import formats as F


def test_lowfp_roundtrip_monotone():
    for fmt in (F.FP16, F.VISIT, F.POLICY, F.VALUE):
        xs = np.linspace(0.0, fmt.max() * 0.999, 200)
        enc = [fmt.to_lowp(float(x)) for x in xs]
        dec = [fmt.to_fp32(e) for e in enc]
        # quantization is monotone and bounded
        assert all(e2 >= e1 for e1, e2 in zip(enc, enc[1:]))
        rel = [abs(d - x) / max(1e-6, x) for x, d in zip(xs[1:], dec[1:])]
        assert max(rel) < 0.2  # coarse formats: <=4 mantissa bits


def test_lowfp_reference_anchor_values():
    # exact anchors derivable from the format definitions
    assert F.VISIT.to_fp32(F.VISIT.to_lowp(0.0)) == 0.0
    assert F.FP16.to_fp32(F.FP16.to_lowp(1.0)) == pytest.approx(1.0, rel=1e-3)
    assert F.POLICY.to_fp32(F.POLICY.to_lowp(F.POLICY.max())) == F.POLICY.max()


def test_score_int8_roundtrip():
    for pv, d in [(F.PV_WIN, 5), (F.PV_LOSS, 12), (F.PV_DRAW, 0)]:
        s = F.score_u16(pv, d)
        back = F.int8_to_score(F.score_to_int8(s))
        assert back == s
    # unproven evals round-trip through the 6-bit score format coarsely
    for ev in (0, 120, 900, -500):
        s = F.score_u16(F.PV_UNKNOWN, ev)
        back = F.int8_to_score(F.score_to_int8(s))
        assert ((back >> 13) & 7) == F.PV_UNKNOWN


def _random_game(rng, hw=81, n_moves=12, fmt=201):
    records = []
    for k in range(n_moves):
        visit = np.zeros(hw, np.int32)
        pol = np.zeros(hw, np.float32)
        wr = np.zeros(hw, np.float32)
        dr = np.zeros(hw, np.float32)
        scores = np.full(hw, F.score_u16(F.PV_UNKNOWN, 0), np.uint16)
        picks = rng.choice(hw, size=8, replace=False)
        visit[picks] = rng.integers(1, 200, 8)
        pol[picks] = rng.random(8).astype(np.float32)
        wr[picks] = rng.random(8).astype(np.float32) * 0.7
        dr[picks] = rng.random(8).astype(np.float32) * 0.2
        scores[picks[0]] = F.score_u16(F.PV_WIN, 3)
        records.append(
            F.SearchRecord(visit, pol, wr, dr, scores, F.score_u16(F.PV_UNKNOWN, 40), k)
        )
    moves = [int(((i * 7) % 9) << 8 | ((i * 3) % 9)) for i in range(n_moves)]
    return F.GameData(records, moves, outcome=2, rows=9, cols=9)


@pytest.mark.parametrize(
    "fmt,compress", [(201, True), (201, False), (200, True), (100, True)]
)
def test_buffer_roundtrip(tmp_path, fmt, compress):
    rng = np.random.default_rng(0)
    games = [_random_game(rng, fmt=fmt) for _ in range(3)]
    path = str(tmp_path / f"buffer_{fmt}.bin")
    F.save_buffer(path, games, rows=9, cols=9, fmt=fmt, compress=compress)
    header, loaded = F.load_buffer(path)
    assert header["format"] == fmt
    assert len(loaded) == 3
    for g0, g1 in zip(games, loaded):
        assert g1.outcome == g0.outcome
        assert g1.rows == 9 and g1.cols == 9
        assert g1.moves == g0.moves
        assert len(g1.records) == len(g0.records)
        for r0, r1 in zip(g0.records, g1.records):
            assert r1.move_number == r0.move_number
            assert r1.minimax_score == r0.minimax_score
            nz = r0.visit_count > 0
            # quantized round-trip: visited cells recovered with coarse
            # 8-bit precision (v201) or exactly (v100)
            tol = 0 if fmt == 100 else np.maximum(2, r0.visit_count[nz] * 0.15)
            assert (np.abs(r1.visit_count[nz] - r0.visit_count[nz]) <= tol).all()
            assert (r1.visit_count[~nz] == 0).all()
            # proven scores survive exactly
            proven0 = ((r0.action_scores >> 13) & 7) != F.PV_UNKNOWN
            assert (r1.action_scores[proven0] == r0.action_scores[proven0]).all()
            if fmt == 100:
                np.testing.assert_allclose(
                    r1.policy_prior[nz], r0.policy_prior[nz], atol=2e-5
                )
            else:
                np.testing.assert_allclose(
                    r1.policy_prior[nz], r0.policy_prior[nz], rtol=0.2, atol=5e-3
                )


def test_v201_byte_parity_vs_reference_oracle():
    """Byte-exact record serialization vs the REFERENCE dataset code
    compiled in oracle/parity_oracle (datapack command)."""
    import os
    import subprocess

    oracle = os.path.join(os.path.dirname(__file__), "..", "oracle", "parity_oracle")
    if not os.path.exists(oracle):
        pytest.skip("parity oracle not built")

    proc = subprocess.Popen(
        [oracle], stdin=subprocess.PIPE, stdout=subprocess.PIPE, text=True
    )

    def lcg(seed):
        s = seed & 0xFFFFFFFFFFFFFFFF

        def next_():
            nonlocal s
            s = (s * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
            return (s >> 33) & 0xFFFFFFFF

        return next_

    rows = cols = 15
    hw = rows * cols
    f32 = np.float32
    for seed, version in [(1, 201), (7, 201), (1234, 201), (999983, 201),
                          (1, 200), (7, 200), (1234, 200), (999983, 200)]:
        proc.stdin.write(f"datapack {seed} {rows} {cols} {version}\n")
        proc.stdin.flush()
        ref_hex = proc.stdout.readline().strip()

        nxt = lcg(seed)
        rec = F.SearchRecord(
            visit_count=np.zeros(hw, np.int32),
            policy_prior=np.zeros(hw, np.float32),
            win_rate=np.zeros(hw, np.float32),
            draw_rate=np.zeros(hw, np.float32),
            action_scores=np.full(hw, F.score_u16(F.PV_UNKNOWN, 0), np.uint16),
            minimax_score=0,
            move_number=0,
        )
        for i in range(hw):
            if (nxt() & 7) == 0:
                rec.visit_count[i] = 1 + nxt() % 500
                rec.policy_prior[i] = f32(nxt() % 10000) / f32(10000.0)
                wr = f32(nxt() % 1000) / f32(1000.0)
                dr = f32(f32(1.0) - wr) * f32(nxt() % 1000) / f32(1000.0)
                rec.win_rate[i] = wr
                rec.draw_rate[i] = dr
                k = nxt() % 10
                if k == 0:
                    rec.action_scores[i] = F.score_u16(F.PV_WIN, 1 + nxt() % 30)
                elif k == 1:
                    rec.action_scores[i] = F.score_u16(F.PV_LOSS, 1 + nxt() % 30)
                else:
                    rec.action_scores[i] = F.score_u16(
                        F.PV_UNKNOWN, int(nxt() % 2001) - 1000
                    )
        rec.minimax_score = F.score_u16(F.PV_UNKNOWN, int(nxt() % 2001) - 1000)
        # the oracle pack has an empty board, so move_number stays 0

        out = bytearray()
        if version == 200:
            F._serialize_record_v200(rec, out)
        else:
            F._serialize_record_v201(rec, out)
        assert out.hex() == ref_hex, f"seed {seed} v{version}: byte divergence"

    proc.stdin.write("quit\n")
    proc.stdin.flush()
    proc.wait(timeout=10)


def _random_games(rng, n_games, rows, cols):
    from alphagomoku_tpu.data import formats as F

    hw = rows * cols
    games = []
    for _ in range(n_games):
        n_rec = int(rng.integers(1, 6))
        records = []
        for m in range(n_rec):
            visit = np.zeros(hw, np.int32)
            hot = rng.choice(hw, size=int(rng.integers(1, 12)), replace=False)
            visit[hot] = rng.integers(1, 900, size=len(hot))
            policy = np.zeros(hw, np.float32)
            policy[hot] = rng.random(len(hot)).astype(np.float32)
            win = np.zeros(hw, np.float32)
            draw = np.zeros(hw, np.float32)
            win[hot] = rng.random(len(hot)).astype(np.float32)
            draw[hot] = (rng.random(len(hot)) * 0.3).astype(np.float32)
            scores = np.full(hw, F.score_u16(F.PV_UNKNOWN, 0), np.uint16)
            if rng.random() < 0.5:
                scores[hot[0]] = F.score_u16(F.PV_WIN, int(rng.integers(1, 30)))
            records.append(F.SearchRecord(
                visit_count=visit, policy_prior=policy, win_rate=win,
                draw_rate=draw, action_scores=scores,
                minimax_score=int(F.score_u16(F.PV_UNKNOWN, int(rng.integers(-900, 900)))),
                move_number=m, flags=int(rng.integers(0, 4)),
            ))
        moves = [int(((c & 0xFF) << 8) | (r & 0xFF)) for r, c in
                 zip(rng.integers(0, rows, n_rec), rng.integers(0, cols, n_rec))]
        games.append(F.GameData(records, moves, int(rng.integers(0, 4)), rows, cols))
    return games


@pytest.mark.parametrize("fmt", [100, 200, 201])
def test_native_codec_byte_identical(fmt):
    """The C++ codec (native/agdata.cpp) must serialize BYTE-IDENTICALLY to
    this module's Python writer and parse value-identically."""
    from alphagomoku_tpu.data import formats as F

    if F._native_lib() is None:
        pytest.skip("native/libagdata.so not built")
    rng = np.random.default_rng(13)
    games = _random_games(rng, 6, 15, 15)
    for g in games:
        py = bytearray()
        F._serialize_game(g, fmt, py)
        nat = bytearray()
        assert F._serialize_game_native(g, fmt, nat)
        assert bytes(py) == bytes(nat), (fmt, len(py), len(nat))
        # parse both ways, compare values
        g_py, off_py = F.parse_game(memoryview(bytes(py)), 0, fmt, 225)
        g_nat, off_nat = F.parse_game_native(bytes(py), 0, fmt, 225)
        assert off_py == off_nat
        assert g_py.moves == g_nat.moves
        assert g_py.outcome == g_nat.outcome
        for a, b in zip(g_py.records, g_nat.records):
            np.testing.assert_array_equal(a.visit_count, b.visit_count)
            np.testing.assert_allclose(a.policy_prior, b.policy_prior, rtol=1e-6)
            np.testing.assert_allclose(a.win_rate, b.win_rate, rtol=1e-6)
            np.testing.assert_allclose(a.draw_rate, b.draw_rate, rtol=1e-6)
            np.testing.assert_array_equal(a.action_scores, b.action_scores)
            assert a.minimax_score == b.minimax_score
            assert a.move_number == b.move_number


def test_native_buffer_roundtrip(tmp_path):
    from alphagomoku_tpu.data import formats as F

    if F._native_lib() is None:
        pytest.skip("native/libagdata.so not built")
    rng = np.random.default_rng(17)
    games = _random_games(rng, 4, 9, 9)
    p = str(tmp_path / "buf.bin")
    F.save_buffer(p, games, 9, 9, fmt=201)
    header, loaded = F.load_buffer(p)
    assert len(loaded) == 4
    for a, b in zip(games, loaded):
        assert a.moves == b.moves and a.outcome == b.outcome
