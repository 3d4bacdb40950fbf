"""Visual (ORB) relocalization.

Re-derivation of the reference's image-retrieval relocalization path
(slam/localization/src/global_localization.cpp ORB thread: DBoW2 bag-of-
words retrieval over keyframe images from the vendored ORB-SLAM subset,
then GICP verification).  Here: cv2 ORB descriptors per keyframe, candidate
retrieval by descriptor matching with a Lowe ratio test, returning ranked
keyframe candidates that the caller verifies with ICP (same flow as the
ScanContext path in localization.py).

Note: retrieval is brute-force over keyframes — exact and fine for maps of
O(1e3) keyframes; a vocabulary tree (DBoW2's role) is the known scaling
lever for larger maps.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

try:
    import cv2
    HAS_CV2 = True
except Exception:  # pragma: no cover
    cv2 = None
    HAS_CV2 = False


class VisualRelocDB:
    def __init__(self, n_features: int = 500, ratio: float = 0.75):
        if not HAS_CV2:
            raise RuntimeError("cv2 unavailable; visual reloc disabled")
        self.orb = cv2.ORB_create(nfeatures=n_features)
        self.matcher = cv2.BFMatcher(cv2.NORM_HAMMING)
        self.ratio = ratio
        self.entries: List[Tuple[int, np.ndarray]] = []   # (keyframe id, desc)

    def _describe(self, image) -> Optional[np.ndarray]:
        if isinstance(image, (bytes, bytearray)):
            image = cv2.imdecode(np.frombuffer(image, np.uint8),
                                 cv2.IMREAD_GRAYSCALE)
        elif image.ndim == 3:
            image = cv2.cvtColor(image, cv2.COLOR_BGR2GRAY)
        if image is None:
            return None
        _kp, desc = self.orb.detectAndCompute(image, None)
        return desc

    def add(self, keyframe_id: int, image) -> bool:
        desc = self._describe(image)
        if desc is None or len(desc) < 8:
            return False
        self.entries.append((int(keyframe_id), desc))
        return True

    def __len__(self) -> int:
        return len(self.entries)

    def query(self, image, top_k: int = 3,
              min_matches: int = 15) -> List[Tuple[int, int]]:
        """-> [(keyframe_id, n_good_matches)] ranked best-first."""
        q = self._describe(image)
        if q is None or len(q) < 8:
            return []
        scored = []
        for (kid, desc) in self.entries:
            knn = self.matcher.knnMatch(q, desc, k=2)
            good = 0
            for pair in knn:
                if len(pair) == 2 and pair[0].distance < self.ratio * pair[1].distance:
                    good += 1
            if good >= min_matches:
                scored.append((kid, good))
        scored.sort(key=lambda kv: -kv[1])
        return scored[:top_k]
