"""LOSS proving for the side to move (reference: the fail-low leg of the
per-leaf alpha-beta over complete defensive move lists,
src/search/alpha_beta/AlphaBetaSearch.cpp:91-135 + MoveGenerator's
MUST_DEFEND stages) — batched via vct_batched.solve_loss."""

import numpy as np
import pytest

from alphagomoku_tpu.game.types import CROSS, CIRCLE, GameRules
from alphagomoku_tpu.game import vectorized as V
from alphagomoku_tpu.search import vct_batched as VB

H = W = 9


@pytest.fixture(scope="module")
def tables():
    return V.device_tables(GameRules.FREESTYLE)


def solve_loss(tables, boards, stm, **kw):
    import jax

    f = jax.jit(lambda b, s: VB.solve_loss(tables, b, s, **kw))
    res = f(np.asarray(boards, np.int8), np.asarray(stm, np.int8))
    return np.asarray(res.loss), np.asarray(res.distance)


def test_open_four_is_lost(tables):
    # X has an open four _XXXX_ ; O to move is lost in 2
    b = np.zeros((1, H, W), np.int8)
    b[0, 4, 2:6] = CROSS
    b[0, 5, 2:5] = CIRCLE
    loss, dist = solve_loss(tables, b, [CIRCLE])
    assert loss[0] and dist[0] == 2, (loss, dist)


def test_single_four_block_holds(tables):
    # X has one half-open four; O blocks it and X has nothing more
    b = np.zeros((1, H, W), np.int8)
    b[0, 4, 0:4] = CROSS  # four at edge: completion only at (4,4)
    b[0, 5, 0:3] = CIRCLE
    loss, dist = solve_loss(tables, b, [CIRCLE])
    assert not loss[0]


def test_forced_block_chain_loss(tables):
    # X: half-open four (must-block) AND an independent double-open-three
    # fork.  O blocks the four; X plays the fork -> VCT; every O defense
    # fails => O provably lost.
    b = np.zeros((1, H, W), np.int8)
    b[0, 0, 0:4] = CROSS  # four completing at (0,4) only
    # scattered white stones (no white three => no counter-fours)
    b[0, 1, 0] = b[0, 2, 2] = b[0, 8, 8] = CIRCLE
    # fork at (5,5): two open threes through it after X plays there
    b[0, 3, 5] = b[0, 4, 5] = CROSS  # vertical pair -> open three
    b[0, 5, 3] = b[0, 5, 4] = CROSS  # horizontal pair -> open three
    loss, dist = solve_loss(tables, b, [CIRCLE], max_steps=512)
    assert loss[0], "forced block into a fork VCT must be a proven loss"
    assert dist[0] >= 4


def test_win3_fork_is_lost_without_counterplay(tables):
    # X (not to move) has TWO separate open threes on the board; O has no
    # four/five makers => proven loss via the win-in-3 defensive table case
    b = np.zeros((1, H, W), np.int8)
    b[0, 2, 2:5] = CROSS  # open three (row 2, cols 2-4)
    b[0, 6, 2] = b[0, 5, 3] = b[0, 4, 4] = CROSS  # open three (diagonal)
    b[0, 8, 0] = b[0, 7, 2] = b[0, 0, 8] = CIRCLE  # quiet white stones
    loss, dist = solve_loss(tables, b, [CIRCLE], max_steps=512)
    assert loss[0], "double open three with no counterplay is lost"


def test_counter_four_blocks_loss_claim(tables):
    # same double-three threat, but O has a four-maker (counter-play):
    # solve_loss must NOT claim a loss (defender can force first)
    b = np.zeros((1, H, W), np.int8)
    b[0, 2, 2:5] = CROSS
    b[0, 6, 2] = b[0, 5, 3] = b[0, 4, 4] = CROSS
    b[0, 8, 0:3] = CIRCLE  # white three: (8,3) makes a four
    loss, dist = solve_loss(tables, b, [CIRCLE], max_steps=512)
    assert not loss[0]


def test_own_five_never_lost(tables):
    # O has an immediate five completion: never a loss even under threats
    b = np.zeros((1, H, W), np.int8)
    b[0, 4, 2:6] = CROSS  # X open four
    b[0, 6, 0:4] = CIRCLE  # O four completing at (6,4)
    loss, dist = solve_loss(tables, b, [CIRCLE])
    assert not loss[0]


def test_quiet_position_unproven(tables):
    b = np.zeros((2, H, W), np.int8)
    b[0, 4, 4] = CROSS
    b[1, 2, 2] = CIRCLE
    loss, dist = solve_loss(tables, b, [CIRCLE, CROSS])
    assert not loss.any()


def test_host_move_generator_agrees_on_claims(tables):
    """Soundness cross-check: wherever solve_loss claims a loss, the exact
    host move generator must NOT find a proven-win or proven-draw move for
    the side to move."""
    from alphagomoku_tpu.search import move_generator as MG

    rng = np.random.default_rng(7)
    boards, stms = [], []
    # tactical soup: random boards seeded with X threat shapes
    for i in range(48):
        b = np.zeros((H, W), np.int8)
        n = rng.integers(4, 16)
        cells = rng.choice(H * W, size=n, replace=False)
        b.flat[cells] = np.where(np.arange(n) % 2 == 0, CROSS, CIRCLE)
        r, c = rng.integers(0, H - 1), rng.integers(0, W - 5)
        k = rng.integers(3, 5)
        b[r, c:c + k] = CROSS  # plant an open/half-open X row
        boards.append(b)
        stms.append(CIRCLE)
    boards = np.stack(boards)
    stms = np.asarray(stms, np.int8)
    loss, dist = solve_loss(tables, boards, stms, max_steps=384)
    checked = 0
    for i in range(len(boards)):
        if not loss[i]:
            continue
        checked += 1
        actions, _ = MG.generate(boards[i], int(stms[i]), GameRules.FREESTYLE)
        for rc in actions.locations():
            s = actions.score_of(rc)
            assert not MG.is_win(s), (
                f"board {i}: solver claims loss but host finds winning {rc}"
            )
    assert checked >= 1, "fuzz produced no claimed losses to check"


def test_mcts_prunes_lost_root(tables):
    """Integration (reference: a lost root is pruned by the solver, not by
    exhausting the K edge slots — AlphaBetaSearch fail-low): the double
    open-three position has ~75 legal defenses, more than max_edges, so the
    complete-node minimax alone can NEVER prove the loss; the loss prover
    must."""
    import jax
    import jax.numpy as jnp

    from alphagomoku_tpu.models import create_network
    from alphagomoku_tpu.search import mcts
    from alphagomoku_tpu.search import score as S

    net = create_network("ConvNextPVQMraw", blocks=1, filters=16)
    x = jnp.zeros((1, H, W, net.cfg.input_planes), jnp.bfloat16)
    variables = net.init(jax.random.PRNGKey(0), x, train=False)

    def apply(v, p):
        return net.apply(v, p, train=False)

    b = np.zeros((1, H, W), np.int8)
    b[0, 2, 2:5] = CROSS
    b[0, 6, 2] = b[0, 5, 3] = b[0, 4, 4] = CROSS
    b[0, 8, 0] = b[0, 7, 2] = b[0, 0, 8] = CIRCLE
    boards = jnp.asarray(b)
    stm = jnp.full((1,), CIRCLE, jnp.int8)
    cfg = mcts.MCTSConfig(
        max_nodes=128, max_edges=16, max_depth=8,
        leaf_solver="vct", leaf_solver_steps=64,
        loss_prover=True, loss_cap=8, loss_options=8,
    )
    st = mcts.run_search(
        apply, variables, tables, cfg, boards, stm, 40, raw_input=True
    )
    root_score = st.tree.node_score[:, 0]
    assert bool(np.asarray(S.is_loss(root_score))[0])
    # descents stop at the proven root (proven-revisit shortcut)
    assert int(np.asarray(st.stats.proven_revisits)[0]) > 0

    cfg_off = cfg._replace(loss_prover=False)
    st_off = mcts.run_search(
        apply, variables, tables, cfg_off, boards, stm, 40, raw_input=True
    )
    assert not bool(np.asarray(S.is_loss(st_off.tree.node_score[:, 0]))[0])
