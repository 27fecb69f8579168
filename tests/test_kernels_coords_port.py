"""S2 coords + latlng golden parity mirrored from
/root/reference/tests/test_s2coords_port.rs and test_s2latlng_port.rs:
quadratic ST<->UV round-trips over the 10k grid at 1e-15, boundary
identities, E5/E6/E7 representations, negative-zero canonicalization."""

import math

import numpy as np

from s2_geometry_rust_spark.kernels import coords as co
from s2_geometry_rust_spark.kernels import latlng as lk


def test_st_uv_boundary_identities():
    # quadratic projection matches the linear map at s in {0, .5, 1}
    for s in (0.0, 0.5, 1.0):
        assert abs(float(co.st_to_uv(s)) - (2.0 * s - 1.0)) < 1e-15
    for u in (-1.0, 0.0, 1.0):
        assert abs(float(co.uv_to_st(u)) - 0.5 * (u + 1.0)) < 1e-15


def test_st_uv_roundtrip_10k_grid():
    # test_s2coords_port.rs:152-166: inverse to 1e-15 over 10001 samples
    x = np.arange(10001, dtype=np.float64) / 10000.0
    uv = co.st_to_uv(x)
    back = co.uv_to_st(uv)
    np.testing.assert_allclose(back, x, rtol=0, atol=1e-15)
    u = 2.0 * x - 1.0
    st = co.uv_to_st(u)
    ub = co.st_to_uv(st)
    np.testing.assert_allclose(ub, u, rtol=0, atol=1e-15)


def test_face_uv_xyz_centers():
    # face centers: face_uv_to_xyz(face, 0, 0) is the face axis
    # (test_s2coords_port.rs FaceUVtoXYZ port)
    for face in range(6):
        x, y, z = co.face_uv_to_xyz(face, 0.0, 0.0)
        v = np.array([float(x), float(y), float(z)])
        assert np.count_nonzero(v) == 1
        assert abs(np.abs(v).max() - 1.0) < 1e-15


def test_latlng_negative_zero_canonicalized():
    # test_s2latlng_port.rs:120-138: from_point canonicalizes -0.0
    lat = lk.xyz_to_lat(np.array([1.0]), np.array([0.0]), np.array([-0.0]))
    lng = lk.xyz_to_lng(np.array([1.0]), np.array([-0.0]), np.array([0.0]))
    assert not np.signbit(lat[0])
    assert not np.signbit(lng[0])


def test_e5_e6_e7_representations():
    # test_s2latlng_port.rs:275-301 style: E-notation round trips
    lat_deg, lng_deg = 32.832889, -117.271587
    lat_e7 = round(lat_deg * 1e7)
    lng_e7 = round(lng_deg * 1e7)
    lat_r = lk.e_to_radians(np.array([lat_e7], np.float64), 7)
    lng_r = lk.e_to_radians(np.array([lng_e7], np.float64), 7)
    assert abs(math.degrees(float(lat_r[0])) - lat_deg) < 1e-7
    assert abs(math.degrees(float(lng_r[0])) - lng_deg) < 1e-7
    # E5 resolution is coarser
    lat_e5 = round(lat_deg * 1e5)
    back5 = math.degrees(float(lk.e_to_radians(np.array([lat_e5], np.float64), 5)[0]))
    assert abs(back5 - lat_deg) < 1e-5


def test_latlng_distance_goldens():
    # test_s2latlng_port.rs:162-196 style haversine spot checks
    d = lk.haversine_distance(
        np.array([0.0]), np.array([0.0]), np.array([0.0]), np.array([0.0])
    )
    assert float(d[0]) == 0.0
    # quarter circle along the equator
    d = lk.haversine_distance(
        np.array([0.0]), np.array([0.0]),
        np.array([0.0]), np.array([math.pi / 2]),
    )
    assert abs(float(d[0]) - math.pi / 2) < 1e-14
    # pole to pole
    d = lk.haversine_distance(
        np.array([math.pi / 2]), np.array([0.0]),
        np.array([-math.pi / 2]), np.array([0.0]),
    )
    assert abs(float(d[0]) - math.pi) < 1e-14
