"""Offline tooling tests: merged-training-file builder (ref: makani/create_merged.py)."""

import numpy as np
import h5py
import pytest

from makani_tpu.tools.create_merged import Variable, fill_nans_2d, run, is_leap
from makani_tpu.utils import timetools as tt
from makani_tpu.utils import nctools as nct


def test_fill_nans_2d_propagates_and_preserves():
    rng = np.random.RandomState(0)
    field = rng.randn(16, 32).astype(np.float32)
    ref = field.copy()
    field[4:8, 10:20] = np.nan
    out = fill_nans_2d(field, num_smooths=30)
    assert np.isfinite(out).all()
    # valid data untouched
    mask = ~np.isnan(field)
    np.testing.assert_array_equal(out[mask], ref[mask])
    # filled values stay within the neighborhood's range (diffusion fill)
    assert out[4:8, 10:20].max() <= ref.max() + 1e-6
    assert out[4:8, 10:20].min() >= ref.min() - 1e-6


def test_fill_nans_2d_wraps_longitude():
    field = np.full((4, 8), np.nan, dtype=np.float32)
    field[:, 3] = 1.0  # single valid meridian
    out = fill_nans_2d(field, num_smooths=20)
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out, 1.0, rtol=1e-5)


def test_variable_spec_parsing():
    v = Variable.parse("mslp:msl")
    assert (v.name, v.src_var, v.source) == ("mslp", "msl", "ERA5")
    v = Variable.parse("ssh@HYCOM")
    assert (v.name, v.src_var, v.source) == ("ssh", "ssh", "HYCOM")


@pytest.mark.parametrize("year,expect", [(2015, False), (2016, True), (2000, True)])
def test_is_leap(year, expect):
    assert is_leap(year) == expect


def test_create_merged_end_to_end(tmp_path):
    year, dlat = 2015, 30.0
    nt = 1460
    ny, nx = 7, 12
    rng = np.random.RandomState(1)

    # synthetic sources in the fork's directory layout, lat ascending
    def write_source(path, name, data):
        path.parent.mkdir(parents=True, exist_ok=True)
        with h5py.File(path, "w") as f:
            f.create_dataset(name, data=data)

    u10 = rng.randn(nt, ny, nx).astype(np.float32)
    ssh = rng.randn(nt, ny, nx).astype(np.float32)
    ssh[:, 2:4, 3:6] = 99.0  # masked-out "land" values (> 15 -> NaN -> filled)
    src = tmp_path / "source"
    write_source(src / "ERA5" / str(year) / f"ERA5_u10_{year}_6h.nc", "u10", u10)
    write_source(src / "HYCOM" / "ssh" / f"ssh_{year}.nc", "ssh", ssh)

    out = tmp_path / "data" / f"{year}.nc"
    run(year, str(out), str(src), ["u10", "ssh@HYCOM"],
        num_smooths=10, time_chunk=512, dlat=dlat)

    fields = nct.read_netcdf_var(str(out), "fields")
    assert fields.shape == (nt, 2, ny, nx)
    # u10 written with latitude flipped (ECMWF convention)
    np.testing.assert_allclose(fields[:, 0], u10[:, ::-1, :], rtol=1e-6)
    # ssh: masked cells filled with finite neighborhood values
    assert np.isfinite(fields[:, 1]).all()
    assert np.abs(fields[:, 1]).max() < 15
    keep = np.ones((ny, nx), bool)
    keep[2:4, 3:6] = False
    np.testing.assert_allclose(fields[:, 1][:, keep[::-1]], ssh[:, ::-1][:, keep[::-1]],
                               rtol=1e-6)

    # time axis: days-since-2000 6-hourly from Jan 1
    time = nct.read_netcdf_var(str(out), "time")
    assert time.shape == (nt,)
    np.testing.assert_allclose(time[0], tt.year_start_days2000(year))
    np.testing.assert_allclose(np.diff(time), 0.25)

    # latitude descending; per-variable name attrs
    latv = nct.read_netcdf_var(str(out), "latitude")
    assert latv[0] == 90.0 and latv[-1] == -90.0
    with h5py.File(str(out), "r") as f:
        assert f["fields"].attrs["f00"] == "u10"
        assert f["fields"].attrs["f01"] == "ssh"


def test_create_merged_partial_write_and_validation(tmp_path):
    year, dlat = 2015, 30.0
    nt, ny, nx = 1460, 7, 12
    u10 = np.ones((nt, ny, nx), np.float32)
    src = tmp_path / "source"
    p = src / "ERA5" / str(year) / f"ERA5_u10_{year}_6h.nc"
    p.parent.mkdir(parents=True)
    with h5py.File(p, "w") as f:
        f.create_dataset("u10", data=u10)

    out = tmp_path / f"{year}.nc"
    # partial: only u10 written; ssh slot stays NaN, and its missing source
    # must not be validated
    run(year, str(out), str(src), ["u10", "ssh@HYCOM"], partial=["u10"],
        num_smooths=2, dlat=dlat)
    fields = nct.read_netcdf_var(str(out), "fields")
    np.testing.assert_allclose(fields[:, 0], 1.0)
    assert np.isnan(fields[:, 1]).all()

    # wrong source shape is rejected up-front
    with h5py.File(p, "w") as f:
        f.create_dataset("u10", data=u10[:, :-1])
    with pytest.raises(ValueError):
        run(year, str(out), str(src), ["u10"], num_smooths=2, dlat=dlat)


def test_h5_align_roundtrip_and_alignment(tmp_path):
    """h5_align rewrites files with aligned dataset offsets (O_DIRECT
    parity, ref: data_process/h5_align.py): data roundtrips exactly, the
    offset is a multiple of align_size, and --transpose emits NHWC."""
    from makani_tpu.tools.h5_align import align_file, verify_file

    data = np.random.RandomState(0).randn(6, 3, 8, 16).astype(np.float32)
    src = str(tmp_path / "1979.h5")
    with h5py.File(src, "w") as f:
        f.create_dataset("fields", data=data)

    dst = str(tmp_path / "aligned" / "1979.h5")
    import os
    os.makedirs(os.path.dirname(dst))
    align_file(src, dst, batch_size=4, align_size_bytes=4096)
    shape, offset, aligned = verify_file(dst, align_size_bytes=4096)
    assert shape == data.shape and aligned, (shape, offset)
    with h5py.File(dst, "r") as f:
        np.testing.assert_array_equal(f["fields"][:], data)

    dst_t = str(tmp_path / "aligned" / "1979_nhwc.h5")
    align_file(src, dst_t, batch_size=4, transpose=True)
    with h5py.File(dst_t, "r") as f:
        np.testing.assert_array_equal(f["fields"][:],
                                      np.transpose(data, (0, 2, 3, 1)))


def test_parallel_copy_assembles_channels(tmp_path):
    """parallel_copy shards per-variable sources over time and assembles
    the multi-channel yearly file (ref: data_process/parallel_copy.py)."""
    from makani_tpu.tools.parallel_copy import parallel_copy

    rng = np.random.RandomState(1)
    nt, ny, nx = 10, 6, 12
    srcs = {}
    for name in ("u", "v", "z"):
        p = str(tmp_path / f"{name}.nc")
        with h5py.File(p, "w") as f:
            # NetCDF-style singleton level axis on one of them
            shape = (nt, 1, ny, nx) if name == "z" else (nt, ny, nx)
            f.create_dataset(name, data=rng.randn(*shape).astype(np.float32))
        srcs[name] = p

    plan = [{"src": srcs["u"], "var": "u", "channel": 0},
            {"src": srcs["v"], "var": "v", "channel": 1},
            {"src": srcs["z"], "var": "z", "channel": 2}]
    dest = str(tmp_path / "1979.h5")
    parallel_copy(plan, dest, n_channels=3, workers=2, batch=3)

    with h5py.File(dest, "r") as f:
        out = f["fields"][:]
    assert out.shape == (nt, 3, ny, nx)
    for i, name in enumerate(("u", "v", "z")):
        with h5py.File(srcs[name], "r") as f:
            src_data = f[name][:]
        np.testing.assert_array_equal(out[:, i], src_data.reshape(nt, ny, nx))
