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
