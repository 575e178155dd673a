"""Config layer contract tests — mirror the behavior pinned by the
reference's test suite (/root/reference/watsor/test/test_config.py)."""

import os
from uuid import uuid4

import pytest

from watsor_tpu.config import parse, validate, normalize, SECRETS_YAML
from watsor_tpu.config.coco import COCO_CLASSES, get_coco_class, coco_label_index


def test_empty_config():
    with pytest.raises(ValueError):
        validate(parse())
    with pytest.raises(FileNotFoundError):
        validate(parse(filename=str(uuid4())))
    with pytest.raises(AssertionError):
        validate(parse(data="\n"))


def test_required():
    minimal_config = """
    cameras:
        - porch:
    """
    with pytest.raises(ValueError) as error:
        validate(parse(data=minimal_config))
    msg = str(error.value)
    assert "cameras.0.porch.detect" in msg and "empty values not allowed" in msg
    for field in ("height", "width", "input"):
        assert "cameras.0.porch.{}".format(field) in msg
    assert "required field" in msg
    assert "cameras.0.porch.ffmpeg.decoder" in msg


def test_defaults():
    minimal_config = """
    ffmpeg:
        decoder: ['-i', '-f', 'rawvideo', '-pix_fmt', 'rgb24']
        encoder: ['-i', '-f', 'rawvideo', '-pix_fmt', 'rgb24']
    detect:
        - person:
    cameras:
        - porch:
            width: 640
            height: 480
            input: http://192.168.42.129:8080/video
            mask: porch.png
            detect:
                - person:
                - truck:
                    area: 80
                    confidence: 70
    """
    config = normalize(validate(parse(data=minimal_config)),
                       os.path.dirname(__file__))

    assert len(config['cameras']) == 1
    camera = config['cameras'][0]
    assert 'porch' in camera
    porch = camera['porch']
    assert porch['width'] == 640
    assert porch['height'] == 480
    # decoder argv: + 'ffmpeg', input url, trailing '-'
    assert len(porch['ffmpeg']['decoder']) == 8
    assert porch['ffmpeg']['decoder'][0] == 'ffmpeg'
    assert porch['ffmpeg']['decoder'][-1] == '-'
    assert 'http://192.168.42.129:8080/video' in porch['ffmpeg']['decoder']
    # encoder argv: + 'ffmpeg', '-s', '640x480', '-' stdin, '-' output
    assert len(porch['ffmpeg']['encoder']) == 10
    assert '640x480' in porch['ffmpeg']['encoder']
    person, truck = porch['detect']
    assert person['person']['area'] == 10
    assert person['person']['confidence'] == 50
    assert truck['truck']['area'] == 80
    assert truck['truck']['confidence'] == 70
    # mask path resolved relative to config dir
    assert os.path.isabs(porch['mask'])


def test_unique():
    minimal_config = """
    ffmpeg:
        decoder: ['-i', '-f', 'rawvideo', '-pix_fmt', 'rgb24']
        encoder: ['-i', '-f', 'rawvideo', '-pix_fmt', 'rgb24']
    detect:
        - person:
        - person:
    cameras:
        - porch:
            width: 640
            height: 480
            input: http://192.168.42.129:8080/video
            detect:
                - truck:
                - truck:
        - porch:
            width: 640
            height: 480
            input: http://192.168.42.129:8080/video
    """
    with pytest.raises(ValueError) as error:
        validate(parse(data=minimal_config))
    msg = str(error.value)
    assert "'person' is already defined" in msg
    assert "'porch' is already defined" in msg
    assert "'truck' is already defined" in msg
    # camera without detect inherits the root detect incl. its duplicate
    assert "cameras.1.porch.detect.1" in msg


def test_detect_labels_restricted_to_coco():
    minimal_config = """
    cameras:
        - porch:
            width: 640
            height: 480
            input: rtsp://x
            ffmpeg:
                decoder: ['-i', '-f', 'rawvideo', '-pix_fmt', 'rgb24']
            detect:
                - unicorn:
    """
    with pytest.raises(ValueError) as error:
        validate(parse(data=minimal_config))
    assert "unallowed value unicorn" in str(error.value)


def test_secrets(tmp_path):
    minimal_config = """
    mqtt:
        host: localhost
        username: !secret mqtt_username
        password: !secret mqtt_password
    ffmpeg:
        decoder: ['-i', '-f', 'rawvideo', '-pix_fmt', 'rgb24']
    detect:
        - person:
    cameras:
        - porch:
            width: 640
            height: 480
            input: http://192.168.42.129:8080/video
    """
    config_file = tmp_path / "config.yaml"
    config_file.write_text(minimal_config)
    (tmp_path / SECRETS_YAML).write_text(
        'mqtt_username: "john"\nmqtt_password: "qwerty"\n')

    config = validate(parse(filename=str(config_file)))
    assert config['mqtt']['username'] == "john"
    assert config['mqtt']['password'] == "qwerty"


def test_secret_missing_raises(tmp_path):
    config_file = tmp_path / "config.yaml"
    config_file.write_text("mqtt:\n  host: !secret nope\n")
    with pytest.raises(ValueError):
        parse(filename=str(config_file))


def test_env_vars(monkeypatch):
    minimal_config = """
    http:
        port: 8080
        username: !env_var "ADMIN_USERNAME john"
        password: !env_var "ADMIN_PASSWORD qwerty"
    mqtt:
        host: localhost
        username: !ENV "${MQTT_ACCOUNT}@${MQTT_DOMAIN}"
        password: !ENV "${MQTT_PASSWORD}"
    cameras:
        - porch:
            width: 640
            height: 480
            input: http://192.168.42.129:8080/video
            ffmpeg:
                decoder: ['-i', '-f', 'rawvideo', '-pix_fmt', 'rgb24']
            detect:
                - person:
    """
    monkeypatch.setenv("ADMIN_USERNAME", "admin")
    monkeypatch.setenv("ADMIN_PASSWORD", "12345678")
    monkeypatch.setenv("MQTT_ACCOUNT", "admin")
    monkeypatch.setenv("MQTT_DOMAIN", "example.com")
    monkeypatch.setenv("MQTT_PASSWORD", "qwerty")

    config = validate(parse(data=minimal_config))
    assert config['http']['username'] == "admin"
    assert config['http']['password'] == "12345678"
    assert config['mqtt']['username'] == "admin@example.com"
    assert config['mqtt']['password'] == "qwerty"


def test_env_var_defaults_used_when_unset(monkeypatch):
    monkeypatch.delenv("NOPE_VAR", raising=False)
    cfg = parse(data='value: !env_var "NOPE_VAR fallback words"\n')
    assert cfg['value'] == "fallback words"
    with pytest.raises(ValueError):
        parse(data='value: !env_var "NOPE_VAR"\n')


def test_password_requires_username():
    minimal_config = """
    http:
        password: hunter2
    cameras:
        - porch:
            width: 640
            height: 480
            input: rtsp://x
            ffmpeg:
                decoder: ['-i', '-f', 'rawvideo', '-pix_fmt', 'rgb24']
            detect:
                - person:
    """
    with pytest.raises(ValueError) as error:
        validate(parse(data=minimal_config))
    assert "username" in str(error.value)


def test_coco_registry():
    assert len(COCO_CLASSES) == 91
    assert COCO_CLASSES[0] == 'unlabeled'
    assert COCO_CLASSES[1] == 'person'
    assert COCO_CLASSES[3] == 'car'
    assert get_coco_class(1).label == 'person'
    assert get_coco_class(10 ** 6).label == 'unlabeled'
    assert coco_label_index('car') == 3
    assert coco_label_index('unicorn') == 0
    # colors deterministic
    assert get_coco_class(1).box_color == get_coco_class(1).box_color


def test_model_key_selects_detector(tmp_path):
    """`model:` in the YAML picks the zoo detector (CLI --model still
    overrides); absent = zoo default."""
    from watsor_tpu.config import loader
    from watsor_tpu.main import detector_spec_from_config
    import argparse
    config_file = tmp_path / 'config.yaml'
    config_file.write_text(
        'model: efficientdet_lite2\n'
        'cameras:\n'
        '  - cam:\n'
        '      width: 64\n'
        '      height: 48\n'
        '      input: synthetic://shapes\n'
        '      ffmpeg: {decoder: [-i, -f, rawvideo, -pix_fmt, rgb24]}\n'
        '      detect: [{person: }]\n')
    config = loader.normalize(loader.validate(loader.parse(
        str(config_file))), str(tmp_path))
    name, _, _ = detector_spec_from_config(
        config, argparse.Namespace(model=None))
    assert name == 'efficientdet_lite2'
    name, _, _ = detector_spec_from_config(
        config, argparse.Namespace(model='ssd_mobilenet_v1'))
    assert name == 'ssd_mobilenet_v1'


def test_unknown_model_name_fails_loudly(tmp_path):
    """A typo'd model name must not silently serve the default detector
    with random weights."""
    import argparse
    import pytest as _pytest
    from watsor_tpu.config import loader
    from watsor_tpu.main import detector_spec_from_config
    config_file = tmp_path / 'config.yaml'
    config_file.write_text(
        'model: ssd_inceptionv2\n'            # typo: missing underscore
        'cameras:\n'
        '  - cam:\n'
        '      width: 64\n'
        '      height: 48\n'
        '      input: synthetic://shapes\n'
        '      ffmpeg: {decoder: [-i, -f, rawvideo, -pix_fmt, rgb24]}\n'
        '      detect: [{person: }]\n')
    config = loader.normalize(loader.validate(loader.parse(
        str(config_file))), str(tmp_path))
    with _pytest.raises(SystemExit, match='unknown model'):
        detector_spec_from_config(config, argparse.Namespace(model=None))


def test_shipped_demo_config_parses_and_mask_loads():
    """The in-repo demo (config/config.yaml + porch_mask.png) must stay
    runnable — it is the Docker image's out-of-the-box configuration."""
    import os
    import cv2
    from watsor_tpu.config import loader
    from watsor_tpu.filters.mask import ZoneMask, get_alpha_channel
    root = os.path.join(os.path.dirname(__file__), os.pardir, 'config')
    path = os.path.abspath(os.path.join(root, 'config.yaml'))
    config = loader.normalize(loader.validate(loader.parse(path)),
                              os.path.dirname(path))
    cam = config['cameras'][0]['demo']
    assert cam['input'] == 'synthetic://shapes'
    assert os.path.isabs(cam['mask']) and os.path.exists(cam['mask'])
    image = cv2.imread(cam['mask'], cv2.IMREAD_UNCHANGED)
    zm = ZoneMask(get_alpha_channel(image),
                  (cam['height'], cam['width'], 3))
    assert zm.num_zones == 2
    # the demo encoder argv (drawtext incl.) translates warning-free
    from watsor_tpu.io.video import encoder_args_from_argv
    args = encoder_args_from_argv(cam['ffmpeg']['encoder'])
    assert args.unknown == []
    assert args.drawtext is not None
