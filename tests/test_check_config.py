"""--check-config: validate-and-exit for CI / k8s init containers —
everything startup would reject (schema, model name, masks, decoder argv
translation) reported without booting the application."""

import numpy as np
import pytest

from watsor_tpu.main import main

GOOD = """
http:
  port: 8080
cameras:
  - cam1:
      width: 160
      height: 120
      input: synthetic://shapes
      mask: {mask}
      detect:
        - person: {{confidence: 50, area: 1}}
      ffmpeg:
        decoder: [-i, -f, rawvideo, -pix_fmt, rgb24]
"""


def _write_mask(path):
    import cv2
    image = np.zeros((120, 160, 4), np.uint8)
    image[10:110, 10:80, 3] = 255
    cv2.imwrite(str(path), image)


def _write(tmp_path, text):
    f = tmp_path / 'config.yaml'
    f.write_text(text)
    return str(f)


def test_check_config_ok(tmp_path, capsys):
    mask = tmp_path / 'mask.png'
    _write_mask(mask)
    cfg = _write(tmp_path, GOOD.format(mask=mask))
    with pytest.raises(SystemExit) as exc:
        main(['-c', cfg, '--check-config'])
    assert exc.value.code == 0
    out = capsys.readouterr().out
    assert 'schema ok' in out
    assert 'mask ok (1 zone(s))' in out
    assert 'decoder argv ok' in out
    assert 'check-config: OK' in out


def test_check_config_schema_error(tmp_path, capsys):
    cfg = _write(tmp_path, 'cameras:\n  - cam1:\n      width: 1\n')
    with pytest.raises(SystemExit) as exc:
        main(['-c', cfg, '--check-config'])
    assert exc.value.code == 1
    assert 'INVALID' in capsys.readouterr().out


def test_check_config_bad_model_and_mask(tmp_path, capsys):
    cfg = _write(tmp_path, GOOD.format(mask=tmp_path / 'missing.png'))
    with pytest.raises(SystemExit) as exc:
        main(['-c', cfg, '--model', 'not_a_model', '--check-config'])
    assert exc.value.code == 1
    out = capsys.readouterr().out
    assert "unknown model 'not_a_model'" in out
    assert 'mask' in out and '2 problem(s)' in out


def test_check_config_reports_fallback_flags(tmp_path, capsys):
    mask = tmp_path / 'mask.png'
    _write_mask(mask)
    cfg = _write(tmp_path, GOOD.format(mask=mask).replace(
        'decoder: [-i, -f, rawvideo, -pix_fmt, rgb24]',
        'decoder: [-ss, "1", -i, -vf, "hue=s=0", -f, rawvideo, '
        '-pix_fmt, rgb24]'))
    with pytest.raises(SystemExit) as exc:
        main(['-c', cfg, '--check-config'])
    assert exc.value.code == 0          # a warning, not a problem
    out = capsys.readouterr().out
    assert 'WATSOR_FFMPEG_FALLBACK=1' in out
