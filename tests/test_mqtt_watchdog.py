"""The §3.4 control loop end to end: MQTT 'OFF' stops the camera decoder
and the watchdog leaves it down; 'ON' clears the stop event and the
watchdog resurrects it (reference: mqtt.py:153-162 + watch.py:32-53)."""

import threading
import time
from queue import Queue

import pytest

from watsor_tpu.output.mqtt import MQTT
from watsor_tpu.runtime.channel import balanced_queue_group
from watsor_tpu.runtime.frames import FrameBuffer
from watsor_tpu.runtime.watchdog import WatchDog
from watsor_tpu.io.synthetic import SyntheticDecoder
from watsor_tpu.testing.broker import MiniBroker

PREFIX = 'watsor/cameras/cam1'


def test_off_on_cycle_with_watchdog():
    broker = MiniBroker()
    buffer = FrameBuffer(6, 64, 48)
    queues = balanced_queue_group(['cam1'], maxsize=2)
    decoder = SyntheticDecoder('cam1', queues['cam1'], buffer, fps=30)
    sink = Queue(1)
    decoder.subscribe(sink)

    # detector stand-in: drain + confirm so the ring keeps cycling
    stop_all = threading.Event()

    def drain():
        from queue import Empty
        while not stop_all.is_set():
            try:
                payload = queues['cam1'].get(timeout=0.2)
            except Empty:
                continue
            frame = buffer.frames[payload.frame_index]
            frame.latch.next()
        # the publisher-side confirmations come from subscribers

    def consume():
        from queue import Empty
        from watsor_tpu.runtime.frames import State
        while not stop_all.is_set():
            try:
                payload = sink.get(timeout=0.2)
            except Empty:
                continue
            frame = buffer.frames[payload.frame_index]
            if frame.latch.wait_for(State.PUBLISH, stop_all.is_set, 2):
                frame.latch.next()

    threading.Thread(target=drain, daemon=True).start()
    threading.Thread(target=consume, daemon=True).start()

    mqtt_queue = Queue(1)
    stage = MQTT('cam1-mqtt', 'cam1', mqtt_queue, buffer,
                 {'host': '127.0.0.1', 'port': broker.port},
                 ['person'], decoder)
    watchdog = WatchDog(interval=0.5)
    watchdog.add(decoder)

    decoder.start()
    stage.start()
    watchdog.start()
    try:
        assert broker.wait_subscribed(PREFIX + '/command', timeout=10)
        assert decoder.is_alive()

        broker.publish(PREFIX + '/command', 'OFF')
        deadline = time.time() + 10
        while decoder.is_alive() and time.time() < deadline:
            time.sleep(0.05)
        assert not decoder.is_alive(), 'OFF did not stop the decoder'
        time.sleep(1.5)   # several watchdog cycles
        assert not decoder.is_alive(), 'watchdog resurrected a disabled camera'
        assert broker.wait_for(
            lambda t, p: t == PREFIX + '/state' and p == b'OFF', timeout=10)

        broker.publish(PREFIX + '/command', 'ON')
        deadline = time.time() + 10
        while not decoder.is_alive() and time.time() < deadline:
            time.sleep(0.05)
        assert decoder.is_alive(), 'watchdog did not resurrect after ON'
        assert broker.wait_for(
            lambda t, p: t == PREFIX + '/state' and p == b'ON', timeout=10)
    finally:
        stop_all.set()
        stage.terminate()
        decoder.terminate()
        watchdog.join(3)
        stage.join(5)
        decoder.join(5)
        broker.close()
