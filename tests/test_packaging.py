"""Packaging contract (r11 verdict #3): pyproject.toml is the
machine-readable home of the dependency contract README describes in
prose, and the in-tree backend must produce valid PEP 427/660 wheels
from the stdlib alone (the reason it exists: offline envs without the
``wheel`` package). No Spark session needed."""

import base64
import hashlib
import importlib.util
import sys
import tomllib
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


@pytest.fixture(scope="module")
def backend():
    spec = importlib.util.spec_from_file_location(
        "dwvi_build_backend", REPO / "_build_backend" / "backend.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def project():
    with open(REPO / "pyproject.toml", "rb") as f:
        return tomllib.load(f)


def test_pyproject_contract(project):
    proj = project["project"]
    # the hard dep is the tested Spark line; Arrow kernels are the
    # documented OPT-IN extra (README "Executor-side Python deps")
    assert any(d.startswith("pyspark") for d in proj["dependencies"])
    arrow = proj["optional-dependencies"]["arrow"]
    assert {d.split(">=")[0] for d in arrow} == {"pandas", "pyarrow", "numpy"}
    assert proj["scripts"]["dwvi-spark"].startswith(
        "datawarehouse_vehicule_insurance_spark"
    )
    # zero build requires is the offline-install guarantee — wheel and
    # editable builds must not need anything pip can't already import
    assert project["build-system"]["requires"] == []


def _check_wheel(whl: Path, expect_member: str):
    with zipfile.ZipFile(whl) as zf:
        names = zf.namelist()
        di = next(n.split("/")[0] for n in names if ".dist-info/" in n)
        assert f"{di}/METADATA" in names
        assert f"{di}/WHEEL" in names
        assert f"{di}/RECORD" in names
        assert any(expect_member in n for n in names)
        meta = zf.read(f"{di}/METADATA").decode()
        assert "Name: datawarehouse-vehicule-insurance-spark" in meta
        assert "Requires-Dist: pyspark" in meta
        assert 'extra == "arrow"' in meta
        # RECORD hashes must verify (PEP 376) — pip checks these on
        # install, so a drifting backend fails here first
        for line in zf.read(f"{di}/RECORD").decode().splitlines():
            name, h, size = line.rsplit(",", 2)
            if not h:
                assert name == f"{di}/RECORD"
                continue
            data = zf.read(name)
            digest = base64.urlsafe_b64encode(
                hashlib.sha256(data).digest()
            ).rstrip(b"=").decode()
            assert h == f"sha256={digest}", name
            assert int(size) == len(data), name


@pytest.mark.slow
def test_build_editable_wheel(backend, tmp_path):
    name = backend.build_editable(str(tmp_path))
    whl = tmp_path / name
    assert whl.is_file() and name.endswith("py3-none-any.whl")
    _check_wheel(whl, "__editable__.")
    # the .pth must point at the repo root (flat layout)
    with zipfile.ZipFile(whl) as zf:
        pth = next(n for n in zf.namelist() if n.endswith(".pth"))
        assert zf.read(pth).decode().strip() == str(REPO)


@pytest.mark.slow
def test_build_regular_wheel(backend, tmp_path):
    name = backend.build_wheel(str(tmp_path))
    whl = tmp_path / name
    _check_wheel(
        whl, "datawarehouse_vehicule_insurance_spark/queries.py"
    )
    with zipfile.ZipFile(whl) as zf:
        assert not any("__pycache__" in n for n in zf.namelist())
        ep = next(
            n for n in zf.namelist() if n.endswith("entry_points.txt")
        )
        assert "dwvi-spark" in zf.read(ep).decode()


@pytest.mark.slow
def test_sdist_round_trip(backend, tmp_path):
    """r12 advice (medium): the sdist must be buildable in ISOLATION —
    pure stdlib, carrying the backend itself and everything the wheel
    hooks need. Round trip: build sdist → extract → build a wheel from
    the EXTRACTED tree's own backend → identical payload RECORD to the
    in-tree wheel."""
    import tarfile

    sdist_name = backend.build_sdist(str(tmp_path))
    sdist = tmp_path / sdist_name
    assert sdist.is_file() and sdist_name.endswith(".tar.gz")
    base = sdist_name.removesuffix(".tar.gz")

    with tarfile.open(sdist) as tf:
        names = tf.getnames()
        # PEP 517 layout: single top dir, metadata + build inputs inside
        assert all(n.split("/")[0] == base for n in names)
        assert f"{base}/PKG-INFO" in names
        assert f"{base}/pyproject.toml" in names
        assert f"{base}/_build_backend/backend.py" in names
        assert (
            f"{base}/datawarehouse_vehicule_insurance_spark/queries.py"
            in names
        )
        assert not any("__pycache__" in n for n in names)
        pkg_info = tf.extractfile(f"{base}/PKG-INFO").read().decode()
        assert "Name: datawarehouse-vehicule-insurance-spark" in pkg_info
        assert "Requires-Dist: pyspark" in pkg_info
        extract_dir = tmp_path / "x"
        tf.extractall(extract_dir, filter="data")

    # build a wheel FROM the extracted sdist via its own backend copy
    spec = importlib.util.spec_from_file_location(
        "dwvi_backend_from_sdist",
        extract_dir / base / "_build_backend" / "backend.py",
    )
    sdist_backend = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sdist_backend)
    (tmp_path / "from_sdist").mkdir()
    whl_name = sdist_backend.build_wheel(str(tmp_path / "from_sdist"))
    _check_wheel(
        tmp_path / "from_sdist" / whl_name,
        "datawarehouse_vehicule_insurance_spark/queries.py",
    )

    # payload identity with the in-tree wheel (RECORD pins name+hash+size
    # of every member, so equal RECORDs == equal wheels)
    (tmp_path / "from_tree").mkdir()
    tree_whl_name = backend.build_wheel(str(tmp_path / "from_tree"))
    assert whl_name == tree_whl_name

    def _record(whl: Path) -> str:
        with zipfile.ZipFile(whl) as zf:
            di = next(
                n.split("/")[0] for n in zf.namelist() if ".dist-info/" in n
            )
            return zf.read(f"{di}/RECORD").decode()

    assert _record(tmp_path / "from_sdist" / whl_name) == _record(
        tmp_path / "from_tree" / tree_whl_name
    )

    # determinism: same tree, byte-identical sdist
    (tmp_path / "again").mkdir()
    again = backend.build_sdist(str(tmp_path / "again"))
    assert (tmp_path / "again" / again).read_bytes() == sdist.read_bytes()

    # zero-build-requires honesty: no hook needs anything importable
    assert backend.get_requires_for_build_sdist() == []
    assert backend.get_requires_for_build_wheel() == []


@pytest.mark.slow
def test_sdist_excludes_stray_working_tree_files(backend, tmp_path):
    """r13 advice (low): sdist/wheel collection is an explicit suffix
    allowlist, not rglob('*') — a stray editor backup planted in the
    package dir must not ride into either artifact (which would also
    break the byte-identical-rebuild guarantee)."""
    import tarfile

    pkg_root = Path(backend._ROOT) / backend._PACKAGE
    stray = pkg_root / "session.py.orig"
    assert not stray.exists(), "leftover stray file in the package tree"
    clean_sdist = backend.build_sdist(str(tmp_path))
    clean_bytes = (tmp_path / clean_sdist).read_bytes()
    try:
        stray.write_text("# editor backup noise\n")
        (tmp_path / "dirty").mkdir()
        dirty_name = backend.build_sdist(str(tmp_path / "dirty"))
        with tarfile.open(tmp_path / "dirty" / dirty_name) as tf:
            assert not any(n.endswith(".orig") for n in tf.getnames())
        # byte-identical despite the stray file
        assert (
            tmp_path / "dirty" / dirty_name
        ).read_bytes() == clean_bytes
        (tmp_path / "dirty_whl").mkdir()
        whl = backend.build_wheel(str(tmp_path / "dirty_whl"))
        with zipfile.ZipFile(tmp_path / "dirty_whl" / whl) as zf:
            assert not any(n.endswith(".orig") for n in zf.namelist())
    finally:
        stray.unlink(missing_ok=True)


@pytest.mark.slow
def test_wheel_from_sdist_imports_in_clean_process(backend, tmp_path):
    """r13 verdict #8 (CI-shape smoke, offline): sdist → extract →
    wheel from the extracted tree → unzip the wheel → import the
    package from it in a fresh interpreter whose sys.path holds ONLY
    the unzipped wheel (plus stdlib/site), proving the sdist carries
    everything the installed package needs."""
    import subprocess
    import tarfile

    sdist_name = backend.build_sdist(str(tmp_path))
    base = sdist_name.removesuffix(".tar.gz")
    with tarfile.open(tmp_path / sdist_name) as tf:
        tf.extractall(tmp_path / "x", filter="data")
    spec = importlib.util.spec_from_file_location(
        "dwvi_backend_ci_smoke",
        tmp_path / "x" / base / "_build_backend" / "backend.py",
    )
    sb = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sb)
    whl = sb.build_wheel(str(tmp_path))
    site = tmp_path / "site"
    with zipfile.ZipFile(tmp_path / whl) as zf:
        zf.extractall(site)
    code = (
        "import sys; sys.path.insert(0, r'%s'); "
        "import datawarehouse_vehicule_insurance_spark as p; "
        "from datawarehouse_vehicule_insurance_spark.operators import "
        "similarity, dedup, gold; "
        "assert r'%s' in p.__file__, p.__file__; print('ok')" % (site, site)
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        cwd=str(tmp_path),
    )
    assert out.returncode == 0, out.stderr
    assert out.stdout.strip() == "ok"


@pytest.mark.slow
def test_editable_wheel_pip_installable(backend, tmp_path):
    """End-to-end: the editable wheel import-works via its .pth —
    simulate what site adds by reading the .pth and importing through
    that path in a scratch sys.path."""
    name = backend.build_editable(str(tmp_path))
    with zipfile.ZipFile(tmp_path / name) as zf:
        pth = next(n for n in zf.namelist() if n.endswith(".pth"))
        root = zf.read(pth).decode().strip()
    assert (
        Path(root) / "datawarehouse_vehicule_insurance_spark" / "__init__.py"
    ).is_file()
    assert root not in sys.path[:0]  # sanity: no mutation leaked
