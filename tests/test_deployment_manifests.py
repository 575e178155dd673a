"""Shipped deployment artifacts stay deployable.

The reference points operators at a Helm chart and a docker-compose file
(/root/reference/README.md:339-402); the rebuild ships docker/ (images +
compose) and docker/k8s/watsor-tpu.yaml. A round-3 review found the k8s
pod could never start: the container set ``args`` without ``command``
against an image that defines CMD only (kubernetes args REPLACE CMD, so
the kubelet would exec "-c" itself). These checks pin the contracts a
cluster enforces only at apply/run time.
"""

import os
import re

import pytest
import yaml

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
DOCKER = os.path.join(REPO, 'docker')
K8S_MANIFEST = os.path.join(DOCKER, 'k8s', 'watsor-tpu.yaml')


def _dockerfile_has_entrypoint(name):
    with open(os.path.join(DOCKER, name)) as f:
        return re.search(r'^ENTRYPOINT\b', f.read(), re.MULTILINE) is not None


@pytest.fixture(scope='module')
def k8s_docs():
    with open(K8S_MANIFEST) as f:
        docs = [d for d in yaml.safe_load_all(f) if d]
    assert docs, 'manifest is empty'
    return docs


def _containers(docs):
    for doc in docs:
        if doc.get('kind') != 'Deployment':
            continue
        spec = doc['spec']['template']['spec']
        for c in spec.get('initContainers', []) + spec.get('containers', []):
            yield c


def test_k8s_manifest_parses_into_expected_kinds(k8s_docs):
    kinds = sorted(d['kind'] for d in k8s_docs)
    assert kinds == ['ConfigMap', 'Deployment', 'Service']


def test_k8s_args_never_ship_without_command(k8s_docs):
    """kubernetes ``args`` replaces the image CMD; with no ENTRYPOINT in
    the image and no ``command`` in the pod spec there is nothing left to
    exec and the pod can never start."""
    image_has_entrypoint = _dockerfile_has_entrypoint('Dockerfile')
    for c in _containers(k8s_docs):
        if c.get('args') and not image_has_entrypoint:
            assert c.get('command'), (
                'container %r sets args against a CMD-only image without '
                'command — the pod cannot start' % c['name'])


def test_k8s_probe_ports_exist(k8s_docs):
    for doc in k8s_docs:
        if doc.get('kind') != 'Deployment':
            continue
        for c in doc['spec']['template']['spec']['containers']:
            named = {p.get('name') for p in c.get('ports', [])}
            numbered = {p.get('containerPort') for p in c.get('ports', [])}
            for probe in ('startupProbe', 'readinessProbe', 'livenessProbe'):
                port = c.get(probe, {}).get('httpGet', {}).get('port')
                if port is not None:
                    assert port in named | numbered, (
                        '%s of %r targets unknown port %r'
                        % (probe, c['name'], port))


def test_k8s_volume_mounts_are_declared(k8s_docs):
    for doc in k8s_docs:
        if doc.get('kind') != 'Deployment':
            continue
        spec = doc['spec']['template']['spec']
        declared = {v['name'] for v in spec.get('volumes', [])}
        for c in _containers([doc]):
            for m in c.get('volumeMounts', []):
                assert m['name'] in declared, (
                    'container %r mounts undeclared volume %r'
                    % (c['name'], m['name']))


def test_k8s_embedded_config_validates(k8s_docs):
    """The ConfigMap's example config.yaml must pass the real schema —
    operators kubectl-apply it verbatim."""
    from watsor_tpu.config.loader import parse, validate

    for doc in k8s_docs:
        if doc.get('kind') != 'ConfigMap':
            continue
        config = validate(parse(data=doc['data']['config.yaml']))
        assert config['cameras'], 'example config declares no cameras'


def test_cpu_dockerfile_is_arch_neutral():
    """The CPU image is the reference's Pi-class arm64 tier
    (/root/reference/README.md:330-392) — it must build under
    ``docker buildx --platform linux/arm64`` unchanged. Pin the things
    that silently break a cross-arch build: platform-pinned FROM lines,
    arch-specific compiler flags reaching the native Makefile, and
    amd64-only package names."""
    with open(os.path.join(DOCKER, 'Dockerfile.cpu')) as f:
        dockerfile = f.read()
    # strip comments — the doc header legitimately mentions the platforms
    lines = [l for l in dockerfile.splitlines()
             if not l.lstrip().startswith('#')]
    body = '\n'.join(lines)
    assert '--platform' not in body, 'FROM/RUN pins an architecture'
    assert re.search(r'\bamd64\b|\bx86_64\b', body) is None
    assert 'buildx build' in dockerfile, 'multi-arch build doc line missing'
    makefile = os.path.join(REPO, 'watsor_tpu', 'native', 'Makefile')
    with open(makefile) as f:
        flags = f.read()
    assert re.search(r'-march|-msse|-mavx', flags) is None, (
        'native Makefile carries arch-specific codegen flags')


def test_compose_services_reference_shipped_dockerfiles():
    with open(os.path.join(DOCKER, 'docker-compose.yaml')) as f:
        compose = yaml.safe_load(f)
    for name, svc in compose.get('services', {}).items():
        build = svc.get('build')
        if isinstance(build, dict) and build.get('dockerfile'):
            # compose resolves context relative to the compose file and
            # dockerfile relative to the context
            context = os.path.normpath(
                os.path.join(DOCKER, build.get('context', '.')))
            path = os.path.join(context, build['dockerfile'])
            assert os.path.exists(path), (
                'service %r builds from missing dockerfile %r'
                % (name, build['dockerfile']))
