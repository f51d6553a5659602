"""Torch-free OGB .pt split reading (data/ogb.py _load_pt_without_torch).

The reference loads splits through ogb's torch pickles (reference
main.py:95); round-2 carried that as torch.load(weights_only=False) —
arbitrary code execution on untrusted files.  These tests pin the
restricted reader: byte-exact tensor recovery WITHOUT torch on the import
path, stride/offset handling, and rejection of non-tensor constructors.
"""

import io
import pickle
import sys
import zipfile

import numpy as np
import pytest
import torch

from plnlp_tpu.data.ogb import (
    _load_pt_without_torch,
    _load_split_file,
)


def _load_with_torch_blocked(path):
    """Call the loader with `import torch` made to fail — proves the
    torch-free reader handled the file without touching the fallback."""
    mp = pytest.MonkeyPatch()
    try:
        mp.setitem(sys.modules, "torch", None)
        return _load_split_file(str(path))
    finally:
        mp.undo()


def test_plain_tensors_roundtrip(tmp_path):
    path = tmp_path / "train.pt"
    data = {
        "edge": torch.arange(24, dtype=torch.int64).reshape(12, 2),
        "weight": torch.linspace(0, 1, 12, dtype=torch.float32),
        "year": torch.full((12,), 2011, dtype=torch.int64),
    }
    torch.save(data, path)
    out = _load_with_torch_blocked(path)
    assert set(out) == set(data)
    for k in data:
        got = out[k]
        assert isinstance(got, np.ndarray), k
        np.testing.assert_array_equal(got, data[k].numpy())


def test_noncontiguous_and_offset_tensors(tmp_path):
    """Stride/offset metadata must be honored (transposed + sliced views)."""
    path = tmp_path / "views.pt"
    base = torch.arange(40, dtype=torch.int64).reshape(5, 8)
    data = {
        "t": base.T,            # non-contiguous stride
        "s": base[1:4, 2:7],    # storage offset + stride
        "scalar": torch.tensor(7, dtype=torch.int64),
    }
    torch.save(data, path)
    out = _load_with_torch_blocked(path)
    np.testing.assert_array_equal(out["t"], base.T.numpy())
    np.testing.assert_array_equal(out["s"], base[1:4, 2:7].numpy())
    assert int(out["scalar"]) == 7


def test_nested_containers(tmp_path):
    path = tmp_path / "nest.pt"
    data = {"a": {"b": [torch.ones(3), torch.zeros(2, dtype=torch.bool)]}}
    torch.save(data, path)
    out = _load_with_torch_blocked(path)
    np.testing.assert_array_equal(out["a"]["b"][0], np.ones(3, np.float32))
    np.testing.assert_array_equal(out["a"]["b"][1], np.zeros(2, bool))


def _evil_zip(path, payload_cls):
    """A torch.save-shaped zip whose pickle calls a non-tensor constructor."""
    buf = io.BytesIO()
    pickle.dump(payload_cls(), buf)
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("archive/data.pkl", buf.getvalue())


def test_restricted_reader_blocks_constructors(tmp_path):
    import collections

    path = tmp_path / "evil.pt"
    _evil_zip(str(path), collections.Counter)
    with pytest.raises(pickle.UnpicklingError, match="blocked unpickle"):
        _load_pt_without_torch(str(path))


class _CustomPayload:
    """Custom class torch.load(weights_only=True) refuses to construct."""

    def __eq__(self, other):
        return isinstance(other, _CustomPayload)


def test_safe_fallback_for_allowlisted_containers(tmp_path):
    """Content beyond plain tensors that weights_only=True still accepts
    loads through the SAFE fallback, with no warning."""
    import collections
    import warnings

    path = tmp_path / "counter.pt"
    torch.save({"c": collections.Counter({"x": 1})}, path)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        out = _load_split_file(str(path))
    assert out["c"] == collections.Counter({"x": 1})


def test_unsafe_fallback_refused_by_default(tmp_path, monkeypatch):
    """Archives both safe readers reject must NOT auto-execute via
    weights_only=False — that hole defeats the restricted reader entirely."""
    path = tmp_path / "exotic.pt"
    # A real torch archive whose content the restricted reader AND
    # torch.load(weights_only=True) both reject (custom constructor).
    torch.save({"o": _CustomPayload()}, path)
    monkeypatch.delenv("PLNLP_UNSAFE_PT_LOAD", raising=False)
    with pytest.raises(RuntimeError, match="PLNLP_UNSAFE_PT_LOAD"):
        _load_split_file(str(path))


def test_unsafe_fallback_opt_in_warns(tmp_path, monkeypatch):
    """With the explicit opt-in env var, the unsafe path runs behind a
    loud warning."""
    path = tmp_path / "exotic.pt"
    torch.save({"o": _CustomPayload()}, path)
    monkeypatch.setenv("PLNLP_UNSAFE_PT_LOAD", "1")
    with pytest.warns(UserWarning, match="weights_only=False"):
        out = _load_split_file(str(path))
    assert out["o"] == _CustomPayload()


def _resave_with_fake_meta(tmp_path, size, stride, offset):
    """A torch.save-layout archive whose pickle calls _rebuild_tensor_v2
    with attacker-chosen (size, stride, offset) over a 4-element int64
    storage — exactly what a crafted malicious .pt file would contain."""
    import torch._utils as tu

    class _Stub:
        pass

    class _P(pickle.Pickler):
        def persistent_id(self, obj):
            if isinstance(obj, _Stub):
                # torch.LongStorage pickles as GLOBAL, which the restricted
                # reader's find_class maps to its int64 storage tag.
                return ("storage", torch.LongStorage, "0", "cpu", 4)
            return None

    class _Call:
        def __reduce__(self):
            return (
                tu._rebuild_tensor_v2,
                (_Stub(), offset, size, stride, False, {}),
            )

    buf = io.BytesIO()
    _P(buf, protocol=2).dump(_Call())
    path = tmp_path / "attack.pt"
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("archive/data.pkl", buf.getvalue())
        zf.writestr("archive/data/0", np.arange(4, dtype=np.int64).tobytes())
    return path


@pytest.mark.parametrize(
    "size,stride,offset",
    [
        ((1000000,), (1,), 0),     # shape far beyond the 4-element storage
        ((2, 2), (8, 1), 0),       # stride walks past the end
        ((4,), (1,), 2),           # offset pushes the tail out of bounds
        ((4,), (-1,), 3),          # negative stride walks backwards
        ((2,), (1,), -1),          # negative offset
    ],
)
def test_oob_tensor_metadata_rejected(tmp_path, size, stride, offset):
    """Crafted shape/stride/offset must raise, not read process memory
    through an unchecked as_strided view (ADVICE r3 high)."""
    path = _resave_with_fake_meta(tmp_path, size, stride, offset)
    with pytest.raises(pickle.UnpicklingError, match="bounds|reaches|offset"):
        _load_pt_without_torch(str(path))


def test_inbounds_view_still_loads(tmp_path):
    """The bounds check must not reject legitimate strided views."""
    path = _resave_with_fake_meta(tmp_path, (2, 2), (2, 1), 0)
    out = _load_pt_without_torch(str(path))
    np.testing.assert_array_equal(out, np.arange(4, dtype=np.int64).reshape(2, 2))


def test_numel_exceeding_member_rejected(tmp_path):
    """A storage claiming more elements than its zip member holds must be
    rejected at persistent_load, not silently truncated."""
    src = tmp_path / "ok.pt"
    torch.save({"t": torch.arange(8, dtype=torch.int64)}, src)
    dst = tmp_path / "short.pt"
    with zipfile.ZipFile(src) as zin:
        entries = [(n, zin.read(n)) for n in zin.namelist()]
    with zipfile.ZipFile(dst, "w") as zout:
        for name, blob in entries:
            if name.split("/")[-1] == "0":  # the storage payload
                blob = blob[: 2 * 8]  # keep 2 of 8 int64 elements
            zout.writestr(name, blob)
    with pytest.raises(pickle.UnpicklingError, match="claims|bytes|bounds|reaches"):
        _load_pt_without_torch(str(dst))


def test_missing_file_raises_file_not_found(tmp_path):
    """A missing split file surfaces as FileNotFoundError, never as a
    torch-fallback parse warning."""
    with pytest.raises(FileNotFoundError):
        _load_split_file(str(tmp_path / "nope.pt"))
