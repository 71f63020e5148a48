"""Preprocessing pipeline tests for the pure-NumPy cores (no mediapipe /
cv2 required): IOU tracking, gap interpolation, procrustes head-pose
recovery, quaternion smoothing, affine transforms, Step-4 filters,
Step-5 resampling/assembly, Step-6 splits."""

import json
import pickle

import numpy as np
import pytest

from msmd_tpu.preprocessing.headpose import (
    head_pose_track_from_landmarks,
    procrustes_analysis,
    rotate_to_neutral,
    rotations_to_yaw_pitch_roll,
    side_profile_fraction,
    smooth_rotation_matrices,
)
from msmd_tpu.preprocessing.runlog import RunLog, load_shard
from msmd_tpu.preprocessing.step4_filter_dataset import (
    filter_has_audio,
    filter_side_profiles,
    filter_speech_annotations,
    filter_valid_tracking,
)
from msmd_tpu.preprocessing.step5_resample_and_assemble import resample_clip, save_chunked_pickle
from msmd_tpu.preprocessing.step6_make_splits import assert_disjoint, make_splits
from msmd_tpu.preprocessing.tracking import calculate_iou, filter_boxes, interpolate_gaps
from msmd_tpu.preprocessing.transform import get_affine_transform, transform_pixel_v2


# ---------------------------------------------------------------------------
# tracking
# ---------------------------------------------------------------------------

def test_iou():
    assert calculate_iou((0, 0, 10, 10), (0, 0, 10, 10)) == pytest.approx(1.0)
    assert calculate_iou((0, 0, 10, 10), (20, 20, 5, 5)) == 0.0
    assert calculate_iou((0, 0, 10, 10), (5, 0, 10, 10)) == pytest.approx(50 / 150)


def test_filter_boxes_single_track():
    frames = [[(0.9, (10, 10, 20, 20))] for _ in range(6)]
    boxes, flags = filter_boxes(frames)
    assert len(boxes) == 6
    assert not flags["has_multiple"] and not flags["has_missing"]
    np.testing.assert_allclose(boxes[3], [10, 10, 20, 20])


def test_filter_boxes_picks_consistent_track():
    # two faces; the "true" face stays near (10,10), a distractor at (100,100).
    # With a full K=5 history the tracked face wins the mean-IOU vote.
    track = lambda i: (0.9, (10 + i, 10, 20, 20))
    distractor = (0.95, (100, 100, 20, 20))
    frames = [[track(i)] for i in range(5)] + [[distractor, track(5)], [track(6)]]
    boxes, flags = filter_boxes(frames)
    assert flags["has_multiple"]
    np.testing.assert_allclose(boxes[5], [15, 10, 20, 20])


def test_filter_boxes_low_iou_falls_back_to_previous():
    # with little history the mean IOU (divided by K=5, reference quirk)
    # stays below 0.4 and the previous frame's box is repeated
    track = lambda i: (0.9, (10 + i, 10, 20, 20))
    distractor = (0.95, (100, 100, 20, 20))
    frames = [[track(0)], [track(1)], [distractor, track(2)], [track(3)]]
    boxes, _ = filter_boxes(frames)
    np.testing.assert_allclose(boxes[2], boxes[1])


def test_filter_boxes_gap_interpolation():
    frames = [[(0.9, (0, 0, 10, 10))], [], [], [(0.9, (30, 0, 10, 10))]]
    boxes, flags = filter_boxes(frames)
    assert flags["has_missing"]
    np.testing.assert_allclose(boxes[1], [10, 0, 10, 10])
    np.testing.assert_allclose(boxes[2], [20, 0, 10, 10])


def test_filter_boxes_missing_endpoints():
    frames = [[], [(0.9, (5, 5, 10, 10))], []]
    boxes, flags = filter_boxes(frames)
    assert flags["no_first_frame"] and flags["no_last_frame"]
    np.testing.assert_allclose(boxes[0], [5, 5, 10, 10])
    np.testing.assert_allclose(boxes[2], [5, 5, 10, 10])


def test_interpolate_gaps():
    a = np.zeros((4, 3))
    b = np.ones((4, 3)) * 3
    out, log = interpolate_gaps([a, None, None, b, None])
    assert log["n_missing"] == 3
    np.testing.assert_allclose(out[1], a + 1)
    np.testing.assert_allclose(out[2], a + 2)
    np.testing.assert_allclose(out[4], b)  # trailing copies nearest


# ---------------------------------------------------------------------------
# head pose
# ---------------------------------------------------------------------------

def _rot_y(deg):
    r = np.deg2rad(deg)
    return np.array([[np.cos(r), 0, np.sin(r)], [0, 1, 0], [-np.sin(r), 0, np.cos(r)]])


def test_procrustes_recovers_similarity():
    rng = np.random.RandomState(0)
    X = rng.randn(3, 20)
    R_true = _rot_y(25.0)
    c_true, t_true = 1.7, np.array([[0.3], [-0.2], [0.5]])
    Y = c_true * R_true @ X + t_true
    R, c, t = procrustes_analysis(X, Y)
    np.testing.assert_allclose(R, R_true, atol=1e-8)
    assert c == pytest.approx(c_true)
    np.testing.assert_allclose(t, t_true, atol=1e-8)


def test_rotate_to_neutral_roundtrip():
    rng = np.random.RandomState(1)
    neutral = rng.randn(30, 3)
    static_idx = list(range(12))
    T = 5
    frames = np.stack([(_rot_y(10 * i) @ neutral.T).T for i in range(T)])
    aligned, rotations, _ = rotate_to_neutral(neutral, frames, static_idx, return_rotation=True)
    for i in range(T):
        np.testing.assert_allclose(aligned[i], neutral, atol=1e-6)
        # recovered rotation undoes the applied one
        np.testing.assert_allclose(rotations[i] @ _rot_y(10 * i), np.eye(3), atol=1e-6)


def test_smooth_rotation_matrices_stays_orthogonal():
    mats = [_rot_y(3 * i + np.random.RandomState(i).randn() * 2) for i in range(20)]
    sm = smooth_rotation_matrices(mats, window_length=7, polyorder=3)
    assert len(sm) == 20
    for R in sm:
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
        assert np.linalg.det(R) == pytest.approx(1.0, abs=1e-6)


def test_yaw_pitch_roll_convention():
    # identity after the X-180 flip = (0, 0, 0)? the flip makes forward 0:
    R_list = [np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]], float)]  # == Rx(180)
    ypr = rotations_to_yaw_pitch_roll(R_list)
    np.testing.assert_allclose(ypr[0], [0, 0, 0], atol=1e-6)


def test_head_pose_track_end_to_end():
    rng = np.random.RandomState(3)
    canonical = rng.randn(478, 3)
    static_idx = list(range(0, 40))
    T = 12
    frames = np.stack([(_rot_y(4 * i) @ canonical.T).T for i in range(T)])
    ypr = head_pose_track_from_landmarks(frames, canonical, static_idx)
    assert ypr.shape == (T, 3)
    # yaw should vary roughly monotonically with the applied rotation
    yaw = ypr[:, 0]
    assert abs(yaw[-1] - yaw[0]) > 20


def test_side_profile_fraction():
    yaw = np.array([0, 10, 60, -70, 5])
    assert side_profile_fraction(yaw) == pytest.approx(2 / 5)


# ---------------------------------------------------------------------------
# affine transform
# ---------------------------------------------------------------------------

def test_affine_transform_center_maps_to_output_center():
    center = np.array([50.0, 80.0])
    trans = get_affine_transform(center, 1.0, 0, (256, 256))
    out = transform_pixel_v2(center[None], trans)
    np.testing.assert_allclose(out[0], [128, 128], atol=1e-4)
    # inverse round-trips
    back = transform_pixel_v2(out, trans, inverse=True)
    np.testing.assert_allclose(back[0], center, atol=1e-4)


def test_affine_transform_rotation():
    center = np.array([0.0, 0.0])
    t0 = get_affine_transform(center, 1.0, 0, (100, 100))
    t90 = get_affine_transform(center, 1.0, 90, (100, 100))
    p = np.array([[10.0, 0.0]])
    p0 = transform_pixel_v2(p, t0)
    p90 = transform_pixel_v2(p, t90)
    assert not np.allclose(p0, p90)


# ---------------------------------------------------------------------------
# Step 4 filters
# ---------------------------------------------------------------------------

def test_step4_filters(tmp_path):
    assert filter_has_audio(["a", "b"], {"a"}) == ["a"]
    ann = {"a": [("talk", 0, 1)], "b": [("sleep", 0, 1)], "c": [("sing", 0, 1)]}
    assert filter_speech_annotations(["a", "b", "c", "d"], ann) == ["a", "c"]

    # tracking filter: pkl presence + runlog flags
    for v, pose in [("a", np.zeros((10, 3))), ("c", np.concatenate([np.zeros((4, 3)), np.full((6, 3), 80.0)]))]:
        with open(tmp_path / f"{v}.pkl", "wb") as f:
            pickle.dump(pose, f)
    runlogs = [{"video_name": "a", "error_too_many_missing_frames": False}]
    assert filter_valid_tracking(["a", "b", "c"], tmp_path, runlogs) == ["a", "c"]
    runlogs.append({"video_name": "c", "error_too_many_missing_frames": True})
    assert filter_valid_tracking(["a", "b", "c"], tmp_path, runlogs) == ["a"]

    # side-profile filter: 'c' is 60% side-view -> dropped
    assert filter_side_profiles(["a", "c"], tmp_path) == ["a"]


# ---------------------------------------------------------------------------
# Step 5 / Step 6
# ---------------------------------------------------------------------------

def test_resample_clip():
    T, sr = 60, 44100
    head = np.random.RandomState(0).randn(T, 3)
    exp = np.random.RandomState(1).randn(T, 64)
    audio = np.random.RandomState(2).randn(sr * 2)
    out = resample_clip(head, exp, audio, video_fps=24.0, audio_sr=sr, goal_fps=30, goal_sr=16000)
    assert out["head_orientation"].shape == (int(T * 30 / 24), 3)
    assert out["expression_code"].shape == (int(T * 30 / 24), 64)
    assert out["audio"].shape == (int(len(audio) * 16000 / sr),)


def test_chunked_pickle_save_and_splits(tmp_path):
    data = {f"v{i}": {"x": np.arange(i)} for i in range(25)}
    path = tmp_path / "data.pkl"
    save_chunked_pickle(data, path, chunk_size=10)
    from msmd_tpu.data.pickle_dataset import load_chunked_pickle

    loaded = load_chunked_pickle(path)
    assert set(loaded) == set(data)

    splits = make_splits(list(data.keys()), seed=42)
    assert len(splits["train"]) == 20 and len(splits["valid"]) == 2 and len(splits["test"]) == 3
    assert_disjoint(splits)
    # seeded: deterministic
    splits2 = make_splits(list(data.keys()), seed=42)
    assert splits == splits2


def test_runlog_resume(tmp_path):
    shard = [["vid1"], ["vid2"]]
    with open(tmp_path / "video_split_0.pkl", "wb") as f:
        pickle.dump(shard, f)
    assert load_shard(tmp_path, "0") == ["vid1", "vid2"]

    log = RunLog(tmp_path / "logs", "0")
    log.append({"video_name": "vid1", "ok": True})
    (tmp_path / "vid1.out").write_text("done")

    # new run resumes: skips vid1 (output + log entry exist)
    log2 = RunLog(tmp_path / "logs", "0")
    assert log2.should_skip("vid1", tmp_path / "vid1.out")
    assert not log2.should_skip("vid2", tmp_path / "vid2.out")
    with open(log2.path) as f:
        assert json.load(f)[0]["video_name"] == "vid1"


def test_debug_video_axis_projection():
    """Identity pose: X axis points right, Y down, Z collapses to the
    origin under orthographic projection (reference Step2:585-625)."""
    from msmd_tpu.preprocessing.debug_video import project_pose_axes, ypr_to_rotation_matrices

    bbox = (100, 50, 40, 20)  # center (120, 60)
    pts = project_pose_axes(np.eye(3), bbox, axis_length=200.0)
    assert pts.tolist() == [[120, 60], [320, 60], [120, 260], [120, 60]]

    # 90-degree yaw about Y: the X axis end rotates out of plane (onto Z),
    # so its projection collapses to the origin; Z projects onto +X.
    R = ypr_to_rotation_matrices(np.array([[90.0, 0.0, 0.0]]))[0]
    pts = project_pose_axes(R, bbox, axis_length=200.0)
    np.testing.assert_allclose(pts[0], [120, 60])
    np.testing.assert_allclose(pts[1], [120, 60], atol=1)   # x-end collapsed
    np.testing.assert_allclose(pts[3], [320, 60], atol=1)   # z-end -> +X

    # round trip: ypr -> R -> ypr (with the stored-roll sign flip)
    ypr = np.array([[20.0, -10.0, 5.0], [-35.0, 15.0, -8.0]])
    Rs = ypr_to_rotation_matrices(ypr)
    from scipy.spatial.transform import Rotation

    eul = Rotation.from_matrix(Rs).as_euler("YXZ", degrees=True)
    eul[:, 2] = -eul[:, 2]
    np.testing.assert_allclose(eul, ypr, atol=1e-9)


def test_debug_video_writer(tmp_path):
    """write_debug_video draws on frames with a pose and passes through
    frames without one (reference Step2:574-645)."""
    import cv2 as cv

    from msmd_tpu.preprocessing.debug_video import write_debug_video

    src = str(tmp_path / "src.mp4")
    w = cv.VideoWriter(src, cv.VideoWriter_fourcc(*"mp4v"), 25.0, (64, 64))
    for _ in range(4):
        w.write(np.zeros((64, 64, 3), np.uint8))
    w.release()

    Rs = [np.eye(3), None, np.eye(3), np.eye(3)]
    bboxes = [(10, 10, 20, 20)] * 4
    out = str(tmp_path / "dbg.mp4")
    n = write_debug_video(src, out, Rs, bboxes, axis_length=15.0)
    assert n == 4

    cap = cv.VideoCapture(out)
    ok, f0 = cap.read()
    ok1, f1 = cap.read()
    cap.release()
    assert ok and ok1
    assert f0.sum() > 0          # overlay drawn
    assert f1.sum() < f0.sum()   # None pose frame left (nearly) black
