"""Literal numpy re-implementations of the reference kernels' semantics.

These play the role the reference's in-tree ``_naive`` kernels play
(``orientation.cu:132-216``, ``descriptor.cu:148-241``): slow, loopy, but
obviously faithful oracles to validate the batched TPU implementations
against.  Semantics follow the *production* (optimised) kernels, including
the W<=10 orientation clamp and synchronous histogram smoothing.
"""

import numpy as np

NBINS = 36
NBO, NBP, MAG = 8, 4, 3.0
MACHINE_EPS = 1.0e-7


def is_extremum(dog, lvl, y, x, peak_threshold=0.0):
    """26-neighbour strict extremum test (keypoint.cu:19-106,195-196).
    dog: (num_dogs, H, W); lvl indexes the centre slice."""
    c = dog[lvl, y, x]
    neigh = []
    for dl in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dl == 0 and dy == 0 and dx == 0:
                    continue
                neigh.append(dog[lvl + dl, y + dy, x + dx])
    neigh = np.array(neigh)
    thr = 0.8 * peak_threshold
    if c >= thr and np.all(c > neigh):
        return True
    if c <= thr and np.all(c < neigh):
        return True
    return False


def refine(dog, lvl, y, x, peak_threshold, edge_threshold, xper, sigma_0, num_dogs):
    """subpixel_refinement (keypoint.cu:108-180). Returns (x, y, sigma, level)
    or None."""
    cur, dn, up = dog[lvl], dog[lvl - 1], dog[lvl + 1]
    c = cur[y, x]
    fx = 0.5 * (cur[y, x + 1] - cur[y, x - 1])
    fy = 0.5 * (cur[y + 1, x] - cur[y - 1, x])
    fs = 0.5 * (up[y, x] - dn[y, x])
    fxx = cur[y, x + 1] + cur[y, x - 1] - 2 * c
    fyy = cur[y + 1, x] + cur[y - 1, x] - 2 * c
    fss = up[y, x] + dn[y, x] - 2 * c
    fxy = 0.25 * (cur[y + 1, x + 1] + cur[y - 1, x - 1] - cur[y + 1, x - 1] - cur[y - 1, x + 1])
    fxs = 0.25 * (up[y, x + 1] + dn[y, x - 1] - up[y, x - 1] - dn[y, x + 1])
    fys = 0.25 * (up[y + 1, x] + dn[y - 1, x] - up[y - 1, x] - dn[y + 1, x])
    A = np.array([[fxx, fxy, fxs], [fxy, fyy, fys], [fxs, fys, fss]], np.float64)
    b = -np.array([fx, fy, fs], np.float64)
    if abs(np.linalg.det(A)) < 1e-30:
        return None
    dx, dy, ds = np.linalg.solve(A, b)
    v = c + 0.5 * (dx * fx + dy * fy + ds * fs)
    det2 = fxx * fyy - fxy * fxy
    s = (fxx + fyy) ** 2 / det2 if det2 != 0 else np.inf
    e = edge_threshold
    if not (abs(v) > peak_threshold and s < (e + 1) ** 2 / e and det2 > 0
            and abs(dx) < 1 and abs(dy) < 1 and abs(ds) < 1):
        return None
    kp_level = lvl - 1
    return (
        (x + dx) * xper,
        (y + dy) * xper,
        sigma_0 * 2.0 ** ((kp_level + ds) / num_dogs) * xper,
        kp_level,
        abs(v),
    )


def detect_keypoints_naive(dog, peak_threshold, edge_threshold, xper, sigma_0, num_dogs):
    """Full dense detect over interior pixels for DoG triples."""
    out = []
    L, H, W = dog.shape
    for lvl in range(1, L - 1):
        for y in range(1, H - 1):
            for x in range(1, W - 1):
                if is_extremum(dog, lvl, y, x, peak_threshold):
                    r = refine(dog, lvl, y, x, peak_threshold, edge_threshold,
                               xper, sigma_0, num_dogs)
                    if r is not None:
                        out.append(r)
    return out


def orientation_naive(grad_level, x, y, s, gaussian_factor=1.5,
                      flipped_sign=False, max_radius=10):
    """kernel_orientations_optim semantics (orientation.cu:11-129) for one
    keypoint in octave coords.  grad_level: (H, W, 2)."""
    H, W = grad_level.shape[:2]
    xi = int(x + 0.5)
    yi = int(y + 0.5)
    sigma_w = gaussian_factor * s
    Wr = max(int(np.floor(3 * sigma_w)), 1)
    Wr = min(Wr, max_radius)  # blockDim/2 - 1 clamp (:29)
    hist = np.zeros(NBINS)
    xmin, xmax = max(-Wr, -xi), min(Wr, W - 1 - xi)
    ymin, ymax = max(-Wr, -yi), min(Wr, H - 1 - yi)
    for cy in range(ymin, ymax + 1):
        for cx in range(xmin, xmax + 1):
            dx = (cx + xi) - x
            dy = (cy + yi) - y
            r2 = dx * dx + dy * dy
            if r2 >= Wr * Wr + 0.6:
                continue
            sign = 1.0 if flipped_sign else -1.0
            wgt = np.exp(sign * r2 / (2 * sigma_w * sigma_w))
            mag = grad_level[yi + cy, xi + cx, 0]
            ang = grad_level[yi + cy, xi + cx, 1]
            b = int(np.floor(NBINS * ang / (2 * np.pi)))
            hist[b % NBINS] += mag * wgt
    # synchronous smoothing x6 (:64-86)
    for _ in range(6):
        hist = (np.roll(hist, 1) + hist + np.roll(hist, -1)) / 3.0
    thr = 0.8 * hist.max()
    angles = []
    for i in range(NBINS):
        h0, hm, hp = hist[i], hist[(i - 1) % NBINS], hist[(i + 1) % NBINS]
        if h0 > thr and h0 > hm and h0 > hp:
            di = -0.5 * (hp - hm) / (hp + hm - 2 * h0)
            angles.append(2 * np.pi * (i + di + 0.5) / NBINS)
            if len(angles) == 2:
                break
    return hist, angles


def descriptor_naive(grad_level, x, y, s, angle0, flipped_sign=False):
    """kernel_descriptor_optim semantics (descriptor.cu:32-145) for one
    keypoint in octave coords; returns raw (unnormalised) 128 vector."""
    H, W = grad_level.shape[:2]
    xi, yi = int(x + 0.5), int(y + 0.5)
    SBP = MAG * s + MACHINE_EPS
    Wr = int(np.floor(np.sqrt(2.0) * SBP * (NBP + 1) / 2.0 + 0.5))
    desc = np.zeros(128)
    binto, binyo, binxo = 1, NBO * NBP, NBO
    center = (NBP // 2) * binyo + (NBP // 2) * binxo
    st0, ct0 = np.sin(angle0), np.cos(angle0)
    wsigma = NBP / 2
    xmin, xmax = max(-Wr, -xi), min(Wr, W - 1 - xi)
    ymin, ymax = max(-Wr, -yi), min(Wr, H - 1 - yi)
    for cy in range(ymin, ymax + 1):
        for cx in range(xmin, xmax + 1):
            mod = grad_level[yi + cy, xi + cx, 0]
            ang = grad_level[yi + cy, xi + cx, 1]
            theta = np.mod(ang - angle0, 2 * np.pi)
            dx = xi + cx - x
            dy = yi + cy - y
            nx = (ct0 * dx + st0 * dy) / SBP
            ny = (-st0 * dx + ct0 * dy) / SBP
            nt = NBO * theta / (2 * np.pi)
            sign = 1.0 if flipped_sign else -1.0
            win = np.exp(sign * (nx * nx + ny * ny) / (2 * wsigma * wsigma))
            binx = int(np.floor(nx - 0.5))
            biny = int(np.floor(ny - 0.5))
            bint = int(np.floor(nt))
            rbinx = nx - (binx + 0.5)
            rbiny = ny - (biny + 0.5)
            rbint = nt - bint
            for dbx in (0, 1):
                for dby in (0, 1):
                    for dbt in (0, 1):
                        if (-(NBP // 2) <= binx + dbx < NBP // 2
                                and -(NBP // 2) <= biny + dby < NBP // 2):
                            wt = (win * mod * abs(1 - dbx - rbinx)
                                  * abs(1 - dby - rbiny) * abs(1 - dbt - rbint))
                            loc = ((binx + dbx) * binxo + (biny + dby) * binyo
                                   + ((bint + dbt) * binto) % NBO)
                            desc[center + loc] += wt
    return desc


def match_naive(desc_a, desc_b, ambiguity=0.8):
    """brute_force_distance + set_matches semantics (match.cu)."""
    out = np.full(len(desc_a), -1, np.int32)
    for i, a in enumerate(desc_a):
        d = np.sum((desc_b - a[None, :]) ** 2, axis=1)
        j = int(np.argmin(d))
        min1 = d[j]
        d2 = d.copy()
        d2[j] = np.inf
        min2 = d2.min() if len(d) > 1 else np.inf
        if min2 > 0 and min1 / min2 < ambiguity:
            out[i] = j
    return out
