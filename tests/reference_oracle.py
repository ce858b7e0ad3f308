"""Literal cv2 re-enactments of the reference post-processing pipelines.

Test-only oracle code: each function mirrors the corresponding reference
function step by step (file:line cited) so the framework's cv2-free
implementations can be compared pixel-for-pixel / point-for-point.
"""
import cv2 as cv
import numpy as np


def find_ext(img):
    res = cv.findContours(img, cv.RETR_EXTERNAL, cv.CHAIN_APPROX_NONE)
    return res[0] if len(res) == 2 else res[1]


def fill_and_delete(gray_label):
    """model_fuse.py:9-32 (input: 2-D uint8 mask)."""
    gray_label = gray_label.copy()
    contours = find_ext(gray_label)
    for i in range(len(contours)):
        area = cv.contourArea(contours[i])
        cv.fillPoly(gray_label, [contours[i]], 255)
        if area <= 1000:
            cv.drawContours(gray_label, contours, i, 0, cv.FILLED)
    contours1 = find_ext(gray_label)
    return gray_label, contours1


def fill_small_target(img, contours):
    """model_fuse.py:52-62."""
    fill_flag = False
    for i in range(len(contours)):
        area = cv.contourArea(contours[i])
        cv.fillPoly(img, [contours[i]], 255)
        if area <= 500:
            fill_flag = True
            cv.drawContours(img, contours, i, 0, cv.FILLED)
    return img, fill_flag


def dilate_process(h, w, contours, kernel, iter_time):
    """model_fuse.py:35-49."""
    result = []
    for j in range(len(contours)):
        cur = np.zeros((h, w), np.uint8)
        cv.drawContours(cur, contours, j, 255, cv.FILLED)
        dil = cv.dilate(cur, kernel, iterations=iter_time)
        cs = find_ext(dil)
        result.append(cs[0])
    return result


def erode_process(img, kernel_size, iteration, vertical=False):
    """model_fuse.py:65-117 (erode_process / erode_process1)."""
    kernel = (
        np.ones((kernel_size, 1), np.uint8)
        if vertical
        else np.ones((1, kernel_size), np.uint8)
    )
    erosion = cv.erode(img.copy(), kernel, iterations=iteration)
    contours = find_ext(erosion)
    if len(contours) == 1:
        return None
    erosion, flag = fill_small_target(erosion, contours)
    h, w = img.shape
    if not flag:
        return dilate_process(h, w, contours, kernel, iteration)
    contours = find_ext(erosion)
    if len(contours) == 0:
        return False
    return dilate_process(h, w, contours, kernel, iteration)


def eroede_dilate_process(gray_label, contours1):
    """model_fuse.py:173-218."""
    h, w = gray_label.shape
    all_cnt = []
    for i in range(len(contours1)):
        plot = np.zeros((h, w), np.uint8)
        cv.drawContours(plot, contours1, i, 255, cv.FILLED)
        cur = erode_process(plot, 5, 5)
        cur1 = erode_process(plot, 5, 5, vertical=True)
        if cur is False or cur1 is False:
            continue
        if cur is None and cur1 is None:
            all_cnt.append(contours1[i])
        elif cur is not None and cur1 is not None:
            all_cnt.extend(cur)
            all_cnt.extend(cur1)
        elif cur is not None:
            all_cnt.extend(cur)
        else:
            all_cnt.extend(cur1)
    return all_cnt


def process_one_mask(mask):
    """model_fuse.py:285-289 for one model mask: clean+split+rasterise."""
    gray, cnt = fill_and_delete(mask)
    all_cnt = eroede_dilate_process(gray, cnt)
    out = np.zeros(mask.shape[:2], np.uint8)
    for i in range(len(all_cnt)):
        cv.drawContours(out, all_cnt, i, 255, cv.FILLED)
    return out


def model_confuse(masks):
    """model_fuse.py:271-350 minus file I/O; masks = 5 2-D uint8 arrays."""
    processed = [process_one_mask(m) for m in masks]
    final = sum(p.astype(np.int32) // 255 for p in processed)
    label = np.where(final >= 3, 255, 0).astype(np.uint8)
    gray, cnt = fill_and_delete(label)
    all_cnt = eroede_dilate_process(gray, cnt)
    out = np.zeros(gray.shape, np.uint8)
    for i in range(len(all_cnt)):
        cv.drawContours(out, all_cnt, i, 255, cv.FILLED)
    return out


# ---------------------------------------------------------------------------
# edge_3.py oracle
# ---------------------------------------------------------------------------
def _iou(initial_bbox, erode_bbox):
    """edge_3.py:26-47."""
    initial_bbox = np.array(initial_bbox)
    erode_bbox = np.array(erode_bbox)
    inter_left = np.maximum(initial_bbox[:2], erode_bbox[:, :2])
    inter_right = np.minimum(initial_bbox[2:4], erode_bbox[:, 2:4])
    wh = np.maximum(inter_right - inter_left, 0)
    inter = wh[:, 0] * wh[:, 1]
    a = (initial_bbox[2] - initial_bbox[0]) * (initial_bbox[3] - initial_bbox[1])
    b = (erode_bbox[:, 2] - erode_bbox[:, 0]) * (erode_bbox[:, 3] - erode_bbox[:, 1])
    iou = inter / (a + b - inter)
    if np.any(iou > 0.5):
        return np.argmax(iou)
    return None


def _process_match(initial_edge, erode_edge):
    """edge_3.py:50-121 (process_td == process_rl modulo None handling)."""
    init_bbox = []
    for j in range(len(initial_edge)):
        if initial_edge[j] is None:
            init_bbox.append([0, 0, 0, 0, j])
            continue
        x, y, w, h = cv.boundingRect(initial_edge[j])
        init_bbox.append([x, y, x + w, y + h, j])
    ero_bbox = []
    for j in range(len(erode_edge)):
        x, y, w, h = cv.boundingRect(erode_edge[j])
        ero_bbox.append([x, y, x + w, y + h, j])
    matched, disappeared = [], []
    for b in init_bbox:
        res = _iou(b, ero_bbox) if ero_bbox else None
        if res is None:
            disappeared.append(b)
        else:
            matched.append(res)
    added = [ero_bbox[i] for i in range(len(erode_edge)) if i not in matched]
    return disappeared, added


def _erode_contours(img3, kernel, cfg_iter=1):
    """edge_3.py:172-202: erode + erase area<50 fragments."""
    erosion = cv.erode(img3.copy(), kernel, iterations=cfg_iter)
    gray = cv.cvtColor(erosion, cv.COLOR_BGR2GRAY)
    contours = find_ext(gray)
    # erode_images_process (edge_3.py:124-144)
    for i in range(len(contours)):
        if cv.contourArea(contours[i]) < 50:
            cv.drawContours(erosion, contours, i, 0, cv.FILLED)
    return find_ext(erosion[:, :, 0].copy())


def detection_points(mask):
    """edge_3.py:310-387 (_detection) on a 2-D uint8 mask; returns corners."""
    img = cv.cvtColor(mask, cv.COLOR_GRAY2BGR)
    cimg = cv.cvtColor(img.copy(), cv.COLOR_BGR2GRAY)
    initial_img = img.copy()
    contours = find_ext(cimg)
    for i in range(len(contours)):
        area = cv.contourArea(contours[i])
        cv.fillPoly(initial_img, [contours[i]], (255, 255, 255))
        if area <= 100:
            cv.drawContours(initial_img, contours, i, 0, cv.FILLED)

    # detction_overlap_building (edge_3.py:159-262)
    gray = cv.cvtColor(initial_img.copy(), cv.COLOR_BGR2GRAY)
    res1 = list(find_ext(gray.copy()))
    target = len(res1)
    contours1 = list(_erode_contours(initial_img, np.ones((1, 7), np.uint8)))
    contours2 = list(_erode_contours(initial_img, np.ones((7, 1), np.uint8)))

    dis = add = dis1 = add1 = None
    if not (len(contours1) == target and len(contours2) == target):
        if len(contours1) != target:
            dis, add = _process_match(res1, contours1)
        if len(contours2) != target:
            dis1, add1 = _process_match(res1, contours2)
        if dis is not None:
            for b in dis:
                res1[b[4]] = None
        if dis1 is not None:
            for b in dis1:
                res1[b[4]] = None
        if add is not None and add1 is not None:
            if len(add) >= 1 and len(add1) >= 1:
                add_2 = []
                for b in add:
                    i1 = _iou(b, add1) if add1 else None
                    res1.append(contours1[b[4]])
                    if i1 is not None:
                        add_2.append(i1)
                for i in range(len(add1)):
                    if i in add_2:
                        continue
                    res1.append(contours2[add1[i][4]])
            elif len(add) >= 1:
                for b in add:
                    res1.append(contours1[b[4]])
            else:
                for b in add1:
                    res1.append(contours2[b[4]])
        elif add is not None:
            for b in add:
                res1.append(contours1[b[4]])
        elif add1 is not None:
            for b in add1:
                res1.append(contours2[b[4]])

    def small_target(edge, epsilon):
        approx = cv.approxPolyDP(edge, epsilon, True)
        points = approx.reshape(-1, 2)
        count, rate = 0, 0.002
        while len(points) != 4:
            epsilon = rate * cv.arcLength(edge, True)
            rate += 0.002
            points = cv.approxPolyDP(edge, epsilon, True).reshape(-1, 2)
            count += 1
            if count > 10:
                break
        if len(points) != 4:
            points = cv.boxPoints(cv.minAreaRect(edge))
        return points

    all_corner = []
    for c in res1:
        if c is None:
            continue
        area = cv.contourArea(c)
        epsilon = 0.01 * cv.arcLength(c, True)
        if cv.moments(c)["m00"] <= 10:
            continue
        if area < 150:
            points = small_target(c, epsilon)
        elif 150 < area < 300:
            points = cv.approxPolyDP(c, 5 * epsilon, True).reshape(-1, 2)
        elif 3000 < area < 8000:
            points = cv.approxPolyDP(c, 0.005 * cv.arcLength(c, True), True).reshape(-1, 2)
        elif 8000 < area <= 15000:
            points = cv.approxPolyDP(c, 0.004 * cv.arcLength(c, True), True).reshape(-1, 2)
        elif area > 15000:
            points = cv.approxPolyDP(c, 0.002 * cv.arcLength(c, True), True).reshape(-1, 2)
        else:
            points = cv.approxPolyDP(c, epsilon, True).reshape(-1, 2)
        x1 = list(points[:, 0]) + [points[0, 0]]
        y1 = list(points[:, 1]) + [points[0, 1]]
        all_corner.append([x1, y1])
    return all_corner, img.shape[0]
