"""MQTT integration over a real socket round trip through the in-process
mini broker: availability, per-class states with the 10 s OFF delay,
sensor JSON, detail JSON, and the remote-control command surface
(ON/OFF/FPS/details) crossing into decoder state."""

import json
import threading
import time
from queue import Queue

import numpy as np
import pytest

from watsor_tpu.output import mqtt as mqtt_module
from watsor_tpu.output.mqtt import MQTT
from watsor_tpu.runtime.frames import DETECTION_DTYPE, FrameBuffer, State
from watsor_tpu.runtime.meters import FramesPerSecond, RateLimiter
from watsor_tpu.runtime.tasks import Payload, Task
from watsor_tpu.testing.broker import MiniBroker

PREFIX = 'watsor/cameras/cam1'


class FakeDecoder(Task):
    """Just enough decoder for the MQTT stage: stop event, rate limiter,
    fps meter, liveness."""

    def __init__(self):
        self.rate_limiter = RateLimiter()
        self.fps = FramesPerSecond()
        super().__init__('cam1')

    def _process(self):
        self.stop_event.wait(0.1)


@pytest.fixture
def rig():
    broker = MiniBroker()
    buffer = FrameBuffer(4, 64, 48)
    queue = Queue(4)
    decoder = FakeDecoder()
    stage = MQTT('cam1-mqtt', 'cam1', queue, buffer,
                 {'host': '127.0.0.1', 'port': broker.port},
                 ['person', 'car'], decoder)
    decoder.start()
    stage.start()
    assert broker.wait_for(
        lambda t, p: t == PREFIX + '/available' and p == b'online'), \
        'client never connected'
    assert broker.wait_subscribed(PREFIX + '/command'), \
        'client never subscribed to commands'
    yield broker, buffer, queue, decoder, stage
    stage.terminate()
    decoder.terminate()
    stage.join(5)
    decoder.join(5)
    broker.close()


def _push_frame(buffer, queue, detections):
    frame = buffer.frames[0]
    frame.stamp()
    records = np.zeros(len(detections), DETECTION_DTYPE)
    for i, (label, conf) in enumerate(detections):
        records[i]['label'] = label
        records[i]['confidence'] = conf
        records[i]['bbox'] = (4, 8, 40, 64)   # (y0, x0, y1, x1) px
    frame.set_detections(records)
    # drive the slot to PUBLISH with one pending confirmation (the stage's)
    frame.latch.next()
    frame.latch.next(1)
    queue.put(Payload('cam1', 0))
    # wait for the stage to confirm (slot back to READY)
    deadline = time.time() + 5
    while frame.latch.state != State.READY and time.time() < deadline:
        time.sleep(0.01)


def test_detection_state_and_sensor(rig):
    broker, buffer, queue, decoder, stage = rig
    _push_frame(buffer, queue, [(1, 0.9)])   # person
    assert broker.wait_for(
        lambda t, p: t == PREFIX + '/detection/person/state' and p == b'ON')
    assert broker.wait_for(lambda t, p: t == PREFIX + '/sensor'
                           and b'fps_in' in p)
    assert broker.wait_for(lambda t, p: t == PREFIX + '/state' and p == b'ON')
    # car was never seen: no ON for it
    assert not any(t == PREFIX + '/detection/car/state' and p == b'ON'
                   for t, p, _ in broker.records)


def test_state_off_after_quiet_period(rig, monkeypatch):
    broker, buffer, queue, decoder, stage = rig
    monkeypatch.setattr(mqtt_module, 'STATE_OFF_DELAY_SECONDS', 0.3)
    _push_frame(buffer, queue, [(1, 0.9)])
    assert broker.wait_for(
        lambda t, p: t == PREFIX + '/detection/person/state' and p == b'ON')
    time.sleep(0.5)
    _push_frame(buffer, queue, [])           # quiet frame past the delay
    assert broker.wait_for(
        lambda t, p: t == PREFIX + '/detection/person/state' and p == b'OFF')


def test_details_toggle_and_payload(rig):
    broker, buffer, queue, decoder, stage = rig
    broker.publish(PREFIX + '/command', 'details = on')
    deadline = time.time() + 5
    while not stage._details_enabled and time.time() < deadline:
        time.sleep(0.05)
    assert stage._details_enabled
    _push_frame(buffer, queue, [(3, 0.8)])   # car
    # exact reference wire format (output/mqtt.py:213-221): 'b' is
    # x-major [x_min, y_min, x_max, y_max]; 't' is an ISO timestamp
    assert broker.wait_for(
        lambda t, p: t == PREFIX + '/detection/car/details'
        and b'"c":80' in p and b'"b":[8,4,64,40]' in p
        and b'"t":"2' in p)


def test_command_off_on_fps(rig):
    broker, buffer, queue, decoder, stage = rig
    broker.publish(PREFIX + '/command', 'OFF')
    deadline = time.time() + 5
    while not decoder.is_shutdown() and time.time() < deadline:
        time.sleep(0.05)
    assert decoder.is_shutdown(), 'OFF command did not stop the decoder'

    broker.publish(PREFIX + '/command', 'ON')
    deadline = time.time() + 5
    while decoder.is_shutdown() and time.time() < deadline:
        time.sleep(0.05)
    assert not decoder.is_shutdown(), 'ON command did not clear stop event'

    broker.publish(PREFIX + '/command', 'FPS = 7')
    deadline = time.time() + 5
    while decoder.rate_limiter.rate != 7 and time.time() < deadline:
        time.sleep(0.05)
    assert decoder.rate_limiter.rate == 7


def test_lwt_offline_on_abnormal_drop(rig):
    broker, buffer, queue, decoder, stage = rig
    # simulate a crash: kill the socket without DISCONNECT
    import socket as socket_module
    stage._client._sock.shutdown(socket_module.SHUT_RDWR)
    assert broker.wait_for(
        lambda t, p: t == PREFIX + '/available' and p == b'offline'), \
        'LWT offline not delivered'


def _wait(predicate, timeout=15):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if predicate():
            return True
        time.sleep(0.05)
    return False


def test_reconnect_after_connection_drop(rig):
    """Session resilience (paho parity): a dropped connection must resume
    — availability re-announced, commands re-subscribed, retained topics
    re-emitted (/root/reference/watsor/output/mqtt.py:98-112)."""
    broker, buffer, queue, decoder, stage = rig
    broker.drop_clients()

    def online_count():
        return sum(1 for t, p, _ in broker.records
                   if t == PREFIX + '/available' and p == b'online')

    assert _wait(lambda: online_count() >= 2), 'availability not re-announced'
    assert broker.wait_subscribed(PREFIX + '/command', timeout=10), \
        'commands not re-subscribed'
    assert _wait(lambda: any(t == PREFIX + '/detection/person/state'
                             for t, p, _ in broker.records)), \
        'retained class state not re-emitted'
    # remote control works again over the new session
    broker.publish(PREFIX + '/command', 'FPS = 9')
    assert _wait(lambda: decoder.rate_limiter.rate == 9), \
        'command lost after reconnect'


def test_reconnect_after_full_broker_restart():
    """The broker process dying entirely (connect refused for a while) must
    not permanently silence the topics — backoff retries until it returns."""
    broker = MiniBroker()
    port = broker.port
    buffer = FrameBuffer(4, 64, 48)
    queue = Queue(4)
    decoder = FakeDecoder()
    stage = MQTT('cam1-mqtt', 'cam1', queue, buffer,
                 {'host': '127.0.0.1', 'port': port},
                 ['person'], decoder)
    decoder.start()
    stage.start()
    try:
        assert broker.wait_for(
            lambda t, p: t == PREFIX + '/available' and p == b'online')
        broker.close()
        time.sleep(0.5)
        broker2 = MiniBroker(port=port)
        try:
            assert broker2.wait_for(
                lambda t, p: t == PREFIX + '/available' and p == b'online',
                timeout=25), 'client never returned after broker restart'
            assert broker2.wait_subscribed(PREFIX + '/command', timeout=10)
        finally:
            broker2.close()
    finally:
        stage.terminate()
        decoder.terminate()
        stage.join(5)
        decoder.join(5)
