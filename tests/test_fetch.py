"""One-command weight acquisition (models/fetch.py): checksum pinning,
archive safety, provenance, and the air-gapped --from-file path — all
offline (the download itself is plain urllib; its failure path is
covered by a refused URL)."""

import json
import os
import tarfile

import numpy as np
import pytest

# timed >30 s on the 1-core CI host (big CPU compiles / TF rigs);
# excluded from `make test-fast`
pytestmark = pytest.mark.slow


from watsor_tpu.models.fetch import (REGISTRY, FetchError, _safe_extract,
                                     fetch, main, sha256_file)


def test_registry_covers_the_reference_model_lineup():
    """Every documented model family has a one-command source
    (/root/reference/README.md:446 model table)."""
    for name in ('ssd_mobilenet_v1', 'ssd_mobilenet_v2',
                 'ssdlite_mobilenet_v2', 'efficientdet_lite0',
                 'efficientdet_lite4'):
        assert name in REGISTRY


def test_unknown_model_is_a_clear_error(tmp_path):
    with pytest.raises(FetchError, match='unknown model'):
        fetch('nonexistent_model', str(tmp_path))


def test_checksum_mismatch_refuses_install(tmp_path):
    archive = tmp_path / 'weights.tar.gz'
    archive.write_bytes(b'not really weights')
    with pytest.raises(FetchError, match='checksum mismatch'):
        fetch('ssd_mobilenet_v2', str(tmp_path), sha256='0' * 64,
              from_file=str(archive))


def test_sha256_file_matches_hashlib(tmp_path):
    import hashlib
    blob = tmp_path / 'blob'
    data = os.urandom(100_000)
    blob.write_bytes(data)
    assert sha256_file(str(blob)) == hashlib.sha256(data).hexdigest()


def test_tarball_path_traversal_refused(tmp_path):
    evil = tmp_path / 'evil.tar'
    with tarfile.open(evil, 'w') as tar:
        victim = tmp_path / 'payload'
        victim.write_bytes(b'x')
        tar.add(victim, arcname='../escape')
    with pytest.raises(FetchError, match='escapes destination'):
        _safe_extract(str(evil), str(tmp_path / 'out'))


def test_download_failure_is_fetch_error(tmp_path, monkeypatch):
    registry = {'model_x': ('http://127.0.0.1:1/nothing.tar.gz',
                            '.index', None)}
    with pytest.raises(FetchError, match='download failed'):
        fetch('model_x', str(tmp_path), registry=registry)


@pytest.fixture(scope='module')
def tflite_archive(tmp_path_factory):
    """A real (tiny) TFLite SSD export packed like a published archive."""
    tf = pytest.importorskip('tensorflow')
    from tests import test_convert_head as tch
    model = tch._build_tf_ssd()
    tch._randomize(model)
    converter = tf.lite.TFLiteConverter.from_keras_model(model)
    tflite = converter.convert()
    root = tmp_path_factory.mktemp('fetch')
    graph = root / 'detect.tflite'
    graph.write_bytes(tflite)
    archive = root / 'model.tar.gz'
    with tarfile.open(archive, 'w:gz') as tar:
        tar.add(graph, arcname='model_dir/detect.tflite')
    return str(archive)


def test_from_file_installs_and_writes_provenance(tflite_archive, tmp_path):
    out = tmp_path / 'model'
    out.mkdir()
    registry = {'ssd_test': ('http://unused.example/x.tar.gz',
                             '.tflite', None)}
    provenance = fetch('ssd_test', str(out), from_file=tflite_archive,
                       registry=registry)
    weight_file = out / 'ssd_test.msgpack'
    assert weight_file.exists()
    sidecar = json.loads((out / 'ssd_test.provenance.json').read_text())
    assert sidecar['archive_sha256'] == sha256_file(tflite_archive)
    assert sidecar['source_url'] is None      # air-gapped install
    assert provenance['artifact'].endswith('.tflite')

    # pinning the recorded digest reproduces the install
    fetch('ssd_test', str(out), from_file=tflite_archive,
          sha256=sidecar['archive_sha256'], registry=registry)


def test_cli_maps_errors_to_exit_code(tmp_path, capsys):
    rc = main(['nonexistent_model', '-o', str(tmp_path)])
    assert rc == 1
    assert 'unknown model' in capsys.readouterr().err
