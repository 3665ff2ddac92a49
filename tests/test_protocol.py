"""Gomocup protocol tests with fake I/O (mirrors the reference's fixture
pattern: listener fed by push_line, asserts on emitted messages;
reference: test/protocols/test_GomocupProtocol.cpp:14-35)."""

import pytest

from alphagomoku_tpu.engine.protocol import (
    InputListener,
    MessageQueue,
    MessageType,
    OutputSender,
)
from alphagomoku_tpu.engine.gomocup import ExtendedGomocupProtocol, GomocupProtocol
from alphagomoku_tpu.game.types import CROSS, CIRCLE, Move


class Fixture:
    def __init__(self, cls=GomocupProtocol):
        self.listener = InputListener()
        self.input_queue = MessageQueue()
        self.output_queue = MessageQueue()
        self.protocol = cls(self.input_queue, self.output_queue)
        self.sent: list[str] = []
        self.sender = OutputSender(self.sent.append)

    def feed(self, *lines):
        for line in lines:
            self.listener.push_line(line)
        while not self.listener.is_empty():
            self.protocol.process_input(self.listener)

    def flush(self):
        self.protocol.process_output(self.sender)

    def input_types(self):
        out = []
        while True:
            m = self.input_queue.try_pop()
            if m is None:
                return out
            out.append((m.type, m.data))


def test_start_ok():
    f = Fixture()
    f.feed("START 15")
    f.flush()
    assert f.sent == ["OK"]
    msgs = f.input_types()
    assert msgs[0][0] == MessageType.START_PROGRAM
    opts = {d[0]: d[1] for t, d in msgs if t == MessageType.SET_OPTION}
    assert opts["rows"] == "15" and opts["draw_after"] == "225"


def test_start_bad_size():
    f = Fixture()
    f.feed("START 10")
    f.flush()
    assert f.sent == ["ERROR Only 15x15 or 20x20 boards are supported"]


def test_turn_flow():
    f = Fixture()
    f.feed("START 15")
    f.flush()
    f.feed("TURN 7,8")
    msgs = f.input_types()
    setpos = [d for t, d in msgs if t == MessageType.SET_POSITION]
    assert setpos and setpos[-1] == [Move(row=7, col=8, sign=CROSS)]
    assert any(t == MessageType.START_SEARCH for t, _ in msgs)


def test_turn_occupied_is_error():
    f = Fixture()
    f.feed("START 15", "TURN 7,7")
    f.input_types()
    f.feed("TURN 7,7")
    f.flush()
    assert any(s.startswith("ERROR") for s in f.sent)


def test_board_reconstruction():
    # own = engine's stones (marker 1); equal counts -> engine plays cross
    f = Fixture()
    f.feed("START 15", "BOARD", "7,7,1", "8,8,2", "DONE")
    msgs = f.input_types()
    setpos = [d for t, d in msgs if t == MessageType.SET_POSITION][-1]
    assert setpos == [
        Move(row=7, col=7, sign=CROSS),
        Move(row=8, col=8, sign=CIRCLE),
    ]


def test_board_opponent_started():
    f = Fixture()
    f.feed("START 15", "BOARD", "0,0,2", "7,7,1", "1,1,2", "DONE")
    msgs = f.input_types()
    setpos = [d for t, d in msgs if t == MessageType.SET_POSITION][-1]
    assert setpos[0] == Move(row=0, col=0, sign=CROSS)
    assert setpos[1] == Move(row=7, col=7, sign=CIRCLE)
    assert setpos[2] == Move(row=1, col=1, sign=CROSS)


def test_board_invalid_counts():
    f = Fixture()
    f.feed("START 15", "BOARD", "0,0,2", "1,1,2", "DONE")
    f.flush()
    assert any("ERROR" in s for s in f.sent)


def test_begin_searches_empty_board():
    f = Fixture()
    f.feed("START 15", "BEGIN")
    msgs = f.input_types()
    setpos = [d for t, d in msgs if t == MessageType.SET_POSITION][-1]
    assert setpos == []


def test_info_rule_mapping():
    f = Fixture()
    f.feed("START 15", "INFO rule 4")
    msgs = f.input_types()
    opts = {d[0]: d[1] for t, d in msgs if t == MessageType.SET_OPTION}
    assert opts["rules"] == "RENJU"


def test_info_rule_invalid():
    f = Fixture()
    f.feed("INFO rule 7")
    f.flush()
    assert f.sent == ["ERROR Invalid rule 7"]


def test_info_timeouts():
    f = Fixture()
    f.feed("INFO timeout_turn 5000", "INFO timeout_match 120000", "INFO time_left 90000")
    opts = {d[0]: d[1] for t, d in f.input_types() if t == MessageType.SET_OPTION}
    assert opts == {
        "time_for_turn": "5000",
        "time_for_match": "120000",
        "time_left": "90000",
    }


def test_takeback():
    f = Fixture()
    f.feed("START 15", "TURN 7,7")
    f.input_types()
    f.feed("TAKEBACK 7,7")
    f.flush()
    assert "OK" in f.sent
    assert f.protocol.list_of_moves == []


def test_takeback_wrong_move():
    f = Fixture()
    f.feed("START 15", "TURN 7,7")
    f.input_types()
    f.feed("TAKEBACK 3,3")
    f.flush()
    assert any(s.startswith("ERROR") for s in f.sent)


def test_unknown_command():
    f = Fixture()
    f.feed("BLAH blah")
    f.flush()
    assert f.sent and f.sent[0].startswith("UNKNOWN")


def test_end_exits():
    f = Fixture()
    f.feed("END")
    assert any(t == MessageType.EXIT_PROGRAM for t, _ in f.input_types())


def test_about():
    f = Fixture()
    f.feed("ABOUT")
    f.flush()
    assert any("AlphaGomokuTPU" in s for s in f.sent)


def test_best_move_output_appends_move():
    from alphagomoku_tpu.engine.protocol import Message

    f = Fixture()
    f.feed("START 15")
    f.flush()
    f.output_queue.push(
        Message(MessageType.BEST_MOVE, Move(row=7, col=8, sign=CROSS))
    )
    f.sent.clear()
    f.flush()
    assert f.sent == ["7,8"]
    assert f.protocol.list_of_moves[-1] == Move(row=7, col=8, sign=CROSS)


# ---- extended protocol ----


def test_extended_play():
    f = Fixture(ExtendedGomocupProtocol)
    f.feed("START 15", "PLAY 3,4")
    f.flush()
    assert "3,4" in f.sent
    assert f.protocol.list_of_moves == [Move(row=3, col=4, sign=CROSS)]


def test_extended_protocolversion_and_clearhash():
    f = Fixture(ExtendedGomocupProtocol)
    f.feed("PROTOCOLVERSION", "CLEARHASH")
    f.flush()
    assert "1" in f.sent and "OK" in f.sent


def test_extended_stop():
    f = Fixture(ExtendedGomocupProtocol)
    f.feed("STOP")
    assert any(t == MessageType.STOP_SEARCH for t, _ in f.input_types())


def test_extended_swap2board():
    f = Fixture(ExtendedGomocupProtocol)
    f.feed("START 15", "SWAP2BOARD", "7,7", "8,8", "9,7", "DONE")
    msgs = f.input_types()
    starts = [d for t, d in msgs if t == MessageType.START_SEARCH]
    assert starts and starts[-1] == "swap2"
    assert len(f.protocol.list_of_moves) == 3
    assert f.protocol.list_of_moves[0].sign == CROSS
    assert f.protocol.list_of_moves[1].sign == CIRCLE


def test_extended_swapboard():
    f = Fixture(ExtendedGomocupProtocol)
    f.feed("START 15", "SWAPBOARD", "7,7", "DONE")
    msgs = f.input_types()
    starts = [d for t, d in msgs if t == MessageType.START_SEARCH]
    assert starts and starts[-1] == "swap"
    assert f.protocol.list_of_moves == [Move(row=7, col=7, sign=CROSS)]


def test_extended_proboard_unknown():
    f = Fixture(ExtendedGomocupProtocol)
    f.feed("PROBOARD")
    f.flush()
    assert any(s.startswith("UNKNOWN") for s in f.sent)


def test_analysis_mode_suggests():
    from alphagomoku_tpu.engine.protocol import Message

    f = Fixture(ExtendedGomocupProtocol)
    f.feed("START 15", "INFO analysis_mode 1")
    f.flush()
    f.output_queue.push(Message(MessageType.BEST_MOVE, Move(row=7, col=8, sign=CROSS)))
    f.sent.clear()
    f.flush()
    assert f.sent == ["SUGGEST 7,8"]
    assert f.protocol.list_of_moves == []  # the move was NOT played
