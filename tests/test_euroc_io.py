"""EuRoC loader tests against a synthetic ASL-layout directory."""

import os

import numpy as np

from niftymatch_tpu.data.euroc import DEFAULT_INTRINSICS, load_sequence


def _write_sequence(root, n=4):
    cam = root / "mav0" / "cam0"
    (cam / "data").mkdir(parents=True)
    gt = root / "mav0" / "state_groundtruth_estimate0"
    gt.mkdir(parents=True)
    with open(cam / "data.csv", "w") as f:
        f.write("#timestamp [ns],filename\n")
        for i in range(n):
            f.write(f"{1403636579763555584 + i * 50000000},{i:019d}.png\n")
            (cam / "data" / f"{i:019d}.png").write_bytes(b"")
    with open(cam / "sensor.yaml", "w") as f:
        f.write(
            "sensor_type: camera\n"
            "intrinsics: [458.654, 457.296, 367.215, 248.375]\n"
            "distortion_coefficients: [-0.28340811, 0.07395907, 0.00019359, 0.0]\n"
        )
    with open(gt / "data.csv", "w") as f:
        f.write("#timestamp, p_RS_R_x [m], p_RS_R_y [m], p_RS_R_z [m], "
                "q_RS_w [], q_RS_x [], q_RS_y [], q_RS_z []\n")
        for i in range(n):
            f.write(
                f"{1403636579763555584 + i * 50000000},"
                f"{0.1 * i},{0.2 * i},{0.3 * i},1.0,0.0,0.0,0.0\n"
            )


def test_euroc_load_sequence(tmp_path):
    _write_sequence(tmp_path)
    seq = load_sequence(str(tmp_path))
    assert len(seq.cam_paths) == 4
    assert os.path.basename(seq.cam_paths[0]).endswith(".png")
    # ns -> s conversion and alignment
    np.testing.assert_allclose(
        np.diff(seq.cam_times), 0.05, atol=1e-6
    )
    np.testing.assert_allclose(seq.groundtruth.positions[2], [0.2, 0.4, 0.6])
    # quaternion reorder (w,x,y,z) -> (x,y,z,w)
    np.testing.assert_allclose(seq.groundtruth.quaternions[0], [0, 0, 0, 1])
    assert seq.intrinsics == (458.654, 457.296, 367.215, 248.375)
    assert abs(seq.distortion[0] + 0.28340811) < 1e-9


def test_euroc_defaults_without_yaml(tmp_path):
    _write_sequence(tmp_path)
    os.remove(tmp_path / "mav0" / "cam0" / "sensor.yaml")
    seq = load_sequence(str(tmp_path))
    assert seq.intrinsics == DEFAULT_INTRINSICS
