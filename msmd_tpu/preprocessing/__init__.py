"""Offline video->(expression, head pose, audio) preprocessing pipeline.

CPU-side rebuild of the reference's 6-step pipeline
(reference: dataset_processing/Step1..Step6): face detection + bbox
tracking, head-pose estimation, expression-code extraction (user-model
extension point), dataset filtering, resampling/assembly, and split
generation. Heavy dependencies (mediapipe, cv2, lmdb, librosa) are
imported lazily per step; the numeric cores (tracking, procrustes,
smoothing, affine crops, splits) are pure NumPy and unit-tested.
"""
