"""YixinBoard realtime analysis stream tests (reference:
YixinBoardProtocol::process_realtime_info + start/stop_realtime_handler,
YixinBoardProtocol.cpp:714-795): REFRESH + POS/DONE on the first snapshot
of a search, LOSE on newly proven losses, BEST on best-move change, all
gated by `info show_detail 1`."""

from alphagomoku_tpu.engine.protocol import (
    InputListener,
    Message,
    MessageQueue,
    MessageType,
    OutputSender,
)
from alphagomoku_tpu.engine.yixin import YixinBoardProtocol


class Fixture:
    def __init__(self):
        self.listener = InputListener()
        self.input_queue = MessageQueue()
        self.output_queue = MessageQueue()
        self.protocol = YixinBoardProtocol(self.input_queue, self.output_queue)
        self.sent: list[str] = []
        self.sender = OutputSender(self.sent.append)

    def feed(self, *lines):
        for line in lines:
            self.listener.push_line(line)
        while not self.listener.is_empty():
            self.protocol.process_input(self.listener)

    def push_snapshot(self, seq, edges, losing, best):
        self.output_queue.push(
            Message(
                MessageType.REALTIME_INFO,
                {"seq": seq, "edges": edges, "losing": losing, "best": best},
            )
        )
        self.protocol.process_output(self.sender)


def test_realtime_stream_first_and_updates():
    f = Fixture()
    f.feed("info show_detail 1")
    assert f.protocol.show_realtime_info

    f.push_snapshot(0, [(7, 7), (7, 8)], [], (7, 7))
    assert "MESSAGE REALTIME REFRESH" in f.sent
    assert "MESSAGE REALTIME POS 7,7" in f.sent
    assert "MESSAGE REALTIME DONE 7,8" in f.sent
    assert "MESSAGE REALTIME BEST 7,7" in f.sent

    f.sent.clear()
    # same best -> silent; a new losing move -> LOSE once
    f.push_snapshot(1, [(7, 7), (7, 8)], [(7, 8)], (7, 7))
    assert f.sent == ["MESSAGE REALTIME LOSE 7,8"]

    f.sent.clear()
    # repeated losing move stays silent; best change announces once
    f.push_snapshot(2, [(7, 7), (7, 8)], [(7, 8)], (6, 6))
    assert f.sent == ["MESSAGE REALTIME BEST 6,6"]

    f.sent.clear()
    # a new search (seq 0) resets the display
    f.push_snapshot(0, [(1, 1)], [], (1, 1))
    assert f.sent[0] == "MESSAGE REALTIME REFRESH"
    assert "MESSAGE REALTIME BEST 1,1" in f.sent


def test_realtime_stream_gated_by_show_detail():
    f = Fixture()
    f.push_snapshot(0, [(7, 7)], [], (7, 7))
    assert f.sent == []  # show_detail not armed -> dropped
    f.feed("info show_detail 0")
    f.push_snapshot(0, [(7, 7)], [], (7, 7))
    assert f.sent == []


def test_realtime_dropped_by_gomocup():
    # protocols without a REALTIME_INFO processor must drop the message
    from alphagomoku_tpu.engine.gomocup import GomocupProtocol

    iq, oq = MessageQueue(), MessageQueue()
    proto = GomocupProtocol(iq, oq)
    sent: list[str] = []
    oq.push(Message(MessageType.REALTIME_INFO, {"seq": 0, "edges": [], "losing": [], "best": None}))
    proto.process_output(OutputSender(sent.append))
    assert sent == []


def test_swap5_and_swap1st_modes():
    """swap5/swap1st controller semantics through the manager (reference:
    Swap5Controller.cpp:29-95, Swap1stController.cpp:21-66)."""
    import io
    import re

    from alphagomoku_tpu.engine.manager import ProgramManager

    out = io.StringIO()
    mgr = ProgramManager(
        protocol="extended", architecture="FastPolicy", blocks=1, filters=8,
        simulations=8, instream=None, outstream=out,
    )
    mgr.options["rows"] = mgr.options["columns"] = "9"
    mgr.options["time_for_turn"] = "200"

    # empty board: swap5 places the first stone immediately
    from alphagomoku_tpu.engine.protocol import Message, MessageType

    mgr.process_message(Message(MessageType.SET_POSITION, []))
    mgr.process_message(Message(MessageType.START_SEARCH, "swap5"))
    mgr.protocol.process_output(mgr.sender)
    assert re.search(r"^\d+,\d+$", out.getvalue(), re.M)

    # one stone on board: swap1st answers SWAP or a move
    from alphagomoku_tpu.game.types import CROSS, Move

    out.truncate(0), out.seek(0)
    mgr.process_message(
        Message(MessageType.SET_POSITION, [Move(row=4, col=4, sign=CROSS)])
    )
    mgr.process_message(Message(MessageType.START_SEARCH, "swap1st"))
    mgr.protocol.process_output(mgr.sender)
    text = out.getvalue()
    assert "SWAP" in text or re.search(r"^\d+,\d+$", text, re.M), text

    # RIF is acknowledged-unsupported, like the reference's header-only stub
    out.truncate(0), out.seek(0)
    mgr.process_message(Message(MessageType.START_SEARCH, "rif"))
    mgr.protocol.process_output(mgr.sender)
    assert "not supported" in out.getvalue()


def test_info_evaluate_answers_from_last_search():
    """info evaluate replies with the queried move's evaluation from the
    last search root (reference: GomocupProtocol.cpp:347-361)."""
    import io
    import re

    from alphagomoku_tpu.engine.manager import ProgramManager
    from alphagomoku_tpu.engine.protocol import Message, MessageType
    from alphagomoku_tpu.game.types import CROSS, Move

    out = io.StringIO()
    mgr = ProgramManager(
        protocol="gomocup", architecture="FastPolicy", blocks=1, filters=8,
        simulations=8, instream=None, outstream=out,
    )
    mgr.options["rows"] = mgr.options["columns"] = "9"
    mgr.options["time_for_turn"] = "200"
    mgr.process_message(Message(MessageType.SET_POSITION, [Move(row=4, col=4, sign=CROSS)]))
    mgr.process_message(Message(MessageType.START_SEARCH, "bestmove"))
    out.truncate(0), out.seek(0)

    # query the move the engine just considered
    mv = mgr.engine._last_root["actions"]
    a = int(mv[mv >= 0][0])
    r, c = a // 9, a % 9
    mgr.protocol.push_line(f"info evaluate {r},{c}") if hasattr(mgr.protocol, "push_line") else None
    mgr.process_message(Message(MessageType.START_SEARCH, f"evaluate {r},{c}"))
    mgr.protocol.process_output(mgr.sender)
    text = out.getvalue()
    assert re.search(r"MESSAGE ev (\d+\.\d+%|WIN|LOSS|DRAW)", text), text
