"""DRAW proving with a draw_after horizon (reference: GameConfig::draw_after
+ MoveGenerator's distance-to-draw gating and try_draw_in_1,
src/search/alpha_beta/MoveGenerator.cpp:162-186,305-353;
Score::draw_in distance arithmetic, include/.../search/Score.hpp:285-317)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphagomoku_tpu.game.types import CROSS, CIRCLE, GameRules
from alphagomoku_tpu.game import vectorized as V
from alphagomoku_tpu.models import create_network
from alphagomoku_tpu.search import mcts
from alphagomoku_tpu.search import score as S

H = W = 9


@pytest.fixture(scope="module")
def net_and_vars():
    net = create_network("FastPolicy", blocks=1, filters=16)
    x = jnp.zeros((1, H, W, net.cfg.input_planes), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x, train=False)

    def apply(v, planes):
        return net.apply(v, planes, train=False)

    return apply, variables


@pytest.fixture(scope="module")
def tables():
    return V.device_tables(GameRules.FREESTYLE)


def quiet_board(stones: int) -> np.ndarray:
    """A threat-free position with `stones` stones (no 3-in-a-rows)."""
    b = np.zeros((H, W), np.int8)
    # pairs spread far apart, alternating colors
    spots = [(0, 0), (0, 3), (0, 6), (3, 0), (3, 3), (3, 6), (6, 0), (6, 3),
             (6, 6), (8, 8), (8, 1), (1, 8)]
    for i in range(stones):
        r, c = spots[i]
        b[r, c] = CROSS if i % 2 == 0 else CIRCLE
    return b


def run(net_and_vars, tables, boards, stm, sims, cfg):
    apply, variables = net_and_vars
    f = jax.jit(
        lambda v, b, s: mcts.run_search(
            apply, v, tables, cfg, b, s, sims, raw_input=True
        )
    )
    return f(variables, jnp.asarray(boards), jnp.asarray(stm))


def test_root_draw_in_1_proven(net_and_vars, tables):
    """One move from the horizon with no win: the root proves draw_in(1)."""
    b = quiet_board(8)
    stm = np.array([CROSS], np.int8)
    cfg = mcts.MCTSConfig(max_nodes=64, max_edges=16, max_depth=8,
                          draw_after=9)  # 8 stones on board -> dtd == 1
    state = run(net_and_vars, tables, b[None], stm, sims=8, cfg=cfg)
    root = np.asarray(state.tree.node_score)[0, 0]
    assert bool(S.is_draw(jnp.asarray(root)))
    assert bool(S.is_proven(jnp.asarray(root)))


def test_draw_horizon_suppresses_win3(net_and_vars, tables):
    """An open four wins in 3 plies — but not when the game draws in 2."""
    b = np.zeros((H, W), np.int8)
    b[4, 2] = b[4, 3] = b[4, 4] = b[4, 5] = CROSS  # open four: win in 1 move
    b[0, 0] = b[0, 8] = b[8, 0] = CIRCLE
    # actually a five-completion exists (win_in_1), use a sparser threat:
    # three with both ends open would be win_in_3 via four -> use open three
    b = np.zeros((H, W), np.int8)
    b[4, 2] = b[4, 3] = b[4, 4] = CROSS  # open three
    b[0, 0] = b[0, 8] = CIRCLE
    stones = int((b != 0).sum())
    stm = np.array([CROSS], np.int8)
    cfg_free = mcts.MCTSConfig(max_nodes=128, max_edges=32, max_depth=12,
                               leaf_solver="vct")
    cfg_horizon = cfg_free._replace(draw_after=stones + 2)  # dtd == 2
    state_free = run(net_and_vars, tables, b[None], stm, sims=16, cfg=cfg_free)
    state_h = run(net_and_vars, tables, b[None], stm, sims=16, cfg=cfg_horizon)
    root_free = np.asarray(state_free.tree.node_score)[0, 0]
    root_h = np.asarray(state_h.tree.node_score)[0, 0]
    # without a horizon the VCT proves the open-three win (3-4 net plies)
    assert bool(S.is_win(jnp.asarray(root_free)))
    # with the game drawing in 2 plies no win proof may survive
    assert not bool(S.is_win(jnp.asarray(root_h)))


def test_static_draw_gating_matches_host_generator():
    """static_solver.analyze draw stages vs the exact host move generator."""
    from alphagomoku_tpu.patterns import features as F
    from alphagomoku_tpu.search import static_solver
    from alphagomoku_tpu.search.move_generator import generate as host_generate

    tables = V.device_tables(GameRules.FREESTYLE)
    rng = np.random.default_rng(3)
    for _ in range(12):
        stones = int(rng.integers(4, 12))
        b = np.zeros((H, W), np.int8)
        cells = rng.choice(H * W, stones, replace=False)
        b.flat[cells] = np.where(np.arange(stones) % 2 == 0, CROSS, CIRCLE)
        draw_after = stones + int(rng.integers(1, 3))  # dtd in {1, 2}
        packed = F.encode(tables, jnp.asarray(b[None]),
                          jnp.asarray([CROSS], jnp.int8))
        legal = ((packed & 1) == 1) & ~(((packed >> 6) & 1) == 1)
        dtd = jnp.asarray([draw_after - stones], jnp.int32)
        ana = static_solver.analyze(packed, legal, dtd)
        node = np.uint16(np.asarray(ana.node_score)[0])
        _actions, host_score = host_generate(
            b, CROSS, GameRules.FREESTYLE, draw_after=draw_after
        )
        host_u = np.uint16(host_score)
        # when the host generator statically proves the node, the batched
        # analyze must agree on the proven class (win/draw) and distance
        if bool(np.asarray(S.is_proven(jnp.asarray(host_u)))):
            if bool(np.asarray(S.is_draw(jnp.asarray(host_u)))):
                assert bool(np.asarray(S.is_draw(jnp.asarray(node)))), (
                    b, draw_after, host_score, node)
            if bool(np.asarray(S.is_win(jnp.asarray(host_u)))):
                assert node == host_u
