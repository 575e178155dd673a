"""The zones operator CLI (reference /root/reference/watsor/zones.py):
prints the zone table from a mask PNG's alpha channel and writes an
annotated overlay."""

import numpy as np
import pytest

cv2 = pytest.importorskip('cv2')

from watsor_tpu import zones


def _mask_png(path, h=120, w=160):
    image = np.zeros((h, w, 4), np.uint8)
    image[:, :, :3] = 200
    image[:, :, 3] = 0
    image[10:50, 10:60, 3] = 255      # zone near origin
    image[70:110, 100:150, 3] = 255   # farther zone
    cv2.imwrite(path, image)


def test_zones_cli_lists_and_annotates(tmp_path, capsys):
    mask = str(tmp_path / 'mask.png')
    out = str(tmp_path / 'annotated.png')
    _mask_png(mask)
    zones.main(['-m', mask, '-o', out])
    printed = capsys.readouterr().out
    assert 'zone  1' in printed and 'zone  2' in printed
    annotated = cv2.imread(out)
    assert annotated is not None and annotated.shape[:2] == (120, 160)


def test_zones_cli_empty_mask(tmp_path, capsys):
    mask = str(tmp_path / 'empty.png')
    image = np.zeros((40, 40, 4), np.uint8)
    cv2.imwrite(mask, image)
    zones.main(['-m', mask])
    assert 'No zones found' in capsys.readouterr().out


def test_zones_cli_show_falls_back_headless(tmp_path, capsys,
                                            monkeypatch):
    """--show on a headless host (no DISPLAY) degrades to the file-output
    hint instead of crashing in cv2.imshow."""
    monkeypatch.delenv('DISPLAY', raising=False)
    monkeypatch.delenv('WAYLAND_DISPLAY', raising=False)
    mask = str(tmp_path / 'mask.png')
    _mask_png(mask)
    zones.main(['-m', mask, '--show'])
    assert 'No display available' in capsys.readouterr().out


def test_zones_cli_show_uses_window_when_display(tmp_path, capsys,
                                                 monkeypatch):
    shown = {}
    monkeypatch.setenv('DISPLAY', ':0')
    monkeypatch.setattr(zones.cv2, 'imshow',
                        lambda title, img: shown.update(shape=img.shape))
    monkeypatch.setattr(zones.cv2, 'waitKey', lambda n: 0)
    monkeypatch.setattr(zones.cv2, 'destroyAllWindows', lambda: None)
    mask = str(tmp_path / 'mask.png')
    _mask_png(mask)
    zones.main(['-m', mask, '--show'])
    assert shown['shape'][:2] == (120, 160)
    assert 'No display available' not in capsys.readouterr().out
