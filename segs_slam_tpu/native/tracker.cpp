// Native RGB-D visual odometry frontend (ORB + PnP RANSAC).
//
// A compact C++ tracking frontend filling the architectural slot of the
// reference's ORB-SLAM3 tracking thread (reference: ORB-SLAM3/src/Tracking.cc
// — ORB features, local-map pose tracking, keyframe decision). This is a
// from-scratch frame-to-local-map tracker, not a port: ORB detection and
// matching (OpenCV) against a sliding window of recent keyframes whose
// depth-backed keypoints live in WORLD coordinates, EPnP RANSAC +
// Levenberg-Marquardt refinement recovering the absolute world-to-camera
// pose (no relative-pose chaining inside the window), and a keyframe policy
// on baseline/rotation/match attrition. It produces the per-keyframe payload
// the MappingOperation protocol carries (pose + keypoints + camera-local 3D).
//
// C ABI for ctypes; all matrices row-major float64/float32.

#include <cstring>
#include <deque>
#include <memory>
#include <vector>

#include <opencv2/calib3d.hpp>
#include <opencv2/core.hpp>
#include <opencv2/features2d.hpp>
#include <opencv2/imgproc.hpp>

namespace {

struct KeyframeRef {
  std::vector<cv::KeyPoint> kps;
  cv::Mat desc;                        // descriptors of depth-valid kps only
  std::vector<cv::Point3f> pts_world;  // world-frame 3D per descriptor row
  std::vector<cv::Point3f> pts_cam;    // camera-local 3D (keyframe payload)
  std::vector<cv::Point2f> px;         // pixels per descriptor row
  cv::Mat R_wc;
  cv::Mat t_wc;
};

struct Tracker {
  cv::Ptr<cv::ORB> orb;
  cv::Ptr<cv::BFMatcher> matcher;
  double fx, fy, cx, cy;
  double min_depth = 0.05, max_depth = 40.0;
  // keyframe policy
  double kf_min_translation = 0.08;   // meters from the last keyframe
  double kf_min_rotation_deg = 8.0;   // degrees
  double kf_min_match_ratio = 0.45;   // inliers vs local-map points
  size_t window = 5;                  // local-map keyframe window

  std::deque<KeyframeRef> kfs;
  cv::Mat R_cur, t_cur;  // world-to-camera of the latest tracked frame
  int frames_since_kf = 0;
};

double rotation_angle_deg(const cv::Mat& R) {
  double tr = R.at<double>(0, 0) + R.at<double>(1, 1) + R.at<double>(2, 2);
  double c = std::min(1.0, std::max(-1.0, (tr - 1.0) / 2.0));
  return std::acos(c) * 180.0 / CV_PI;
}

void quat_from_R(const cv::Mat& R, double* q) {
  double m[9];
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) m[i * 3 + j] = R.at<double>(i, j);
  double tr = m[0] + m[4] + m[8];
  double qw, qx, qy, qz;
  if (tr > 0) {
    double s = std::sqrt(tr + 1.0) * 2;
    qw = 0.25 * s;
    qx = (m[7] - m[5]) / s;
    qy = (m[2] - m[6]) / s;
    qz = (m[3] - m[1]) / s;
  } else if (m[0] > m[4] && m[0] > m[8]) {
    double s = std::sqrt(1.0 + m[0] - m[4] - m[8]) * 2;
    qw = (m[7] - m[5]) / s;
    qx = 0.25 * s;
    qy = (m[1] + m[3]) / s;
    qz = (m[2] + m[6]) / s;
  } else if (m[4] > m[8]) {
    double s = std::sqrt(1.0 + m[4] - m[0] - m[8]) * 2;
    qw = (m[2] - m[6]) / s;
    qx = (m[1] + m[3]) / s;
    qy = 0.25 * s;
    qz = (m[5] + m[7]) / s;
  } else {
    double s = std::sqrt(1.0 + m[8] - m[0] - m[4]) * 2;
    qw = (m[3] - m[1]) / s;
    qx = (m[2] + m[6]) / s;
    qy = (m[5] + m[7]) / s;
    qz = 0.25 * s;
  }
  q[0] = qw;
  q[1] = qx;
  q[2] = qy;
  q[3] = qz;
}

}  // namespace

extern "C" {

void* sg_tracker_create(double fx, double fy, double cx, double cy,
                        int n_features) {
  auto* T = new Tracker();
  T->orb = cv::ORB::create(n_features > 0 ? n_features : 1500,
                           /*scaleFactor=*/1.2f, /*nlevels=*/8,
                           /*edgeThreshold=*/19, /*firstLevel=*/0,
                           /*WTA_K=*/2, cv::ORB::HARRIS_SCORE,
                           /*patchSize=*/31, /*fastThreshold=*/7);
  T->matcher = cv::BFMatcher::create(cv::NORM_HAMMING, /*crossCheck=*/true);
  T->fx = fx;
  T->fy = fy;
  T->cx = cx;
  T->cy = cy;
  T->R_cur = cv::Mat::eye(3, 3, CV_64F);
  T->t_cur = cv::Mat::zeros(3, 1, CV_64F);
  return T;
}

// Track one RGB-D frame.
//   gray: uint8 h*w, depth: float h*w (meters)
//   pose_out: 7 doubles (tx ty tz qw qx qy qz), world-to-camera
// Returns: 1 = tracked & new keyframe, 0 = tracked, -1 = lost/bootstrap.
int sg_tracker_track(void* handle, const unsigned char* gray,
                     const float* depth, int w, int h, double* pose_out,
                     int* n_inliers_out) {
  auto* T = static_cast<Tracker*>(handle);
  cv::Mat img(h, w, CV_8UC1, const_cast<unsigned char*>(gray));

  std::vector<cv::KeyPoint> kps;
  cv::Mat desc;
  T->orb->detectAndCompute(img, cv::noArray(), kps, desc);

  auto make_kf = [&](const cv::Mat& R, const cv::Mat& t) {
    KeyframeRef kf;
    kf.R_wc = R.clone();
    kf.t_wc = t.clone();
    cv::Mat C2W_R = R.t();
    cv::Mat cam_center = -C2W_R * t;
    std::vector<int> rows;
    for (size_t i = 0; i < kps.size(); ++i) {
      int u = static_cast<int>(kps[i].pt.x + 0.5f);
      int v = static_cast<int>(kps[i].pt.y + 0.5f);
      float z = (u >= 0 && u < w && v >= 0 && v < h) ? depth[v * w + u] : 0.f;
      if (!(z > T->min_depth && z < T->max_depth)) continue;
      cv::Point3f p_cam(static_cast<float>((kps[i].pt.x - T->cx) / T->fx * z),
                        static_cast<float>((kps[i].pt.y - T->cy) / T->fy * z),
                        z);
      cv::Mat pc = (cv::Mat_<double>(3, 1) << p_cam.x, p_cam.y, p_cam.z);
      cv::Mat pw = C2W_R * pc + cam_center;
      kf.kps.push_back(kps[i]);
      kf.px.push_back(kps[i].pt);
      kf.pts_cam.push_back(p_cam);
      kf.pts_world.push_back(cv::Point3f(
          static_cast<float>(pw.at<double>(0)),
          static_cast<float>(pw.at<double>(1)),
          static_cast<float>(pw.at<double>(2))));
      rows.push_back(static_cast<int>(i));
    }
    kf.desc.create(static_cast<int>(rows.size()), desc.cols, desc.type());
    for (size_t r = 0; r < rows.size(); ++r)
      desc.row(rows[r]).copyTo(kf.desc.row(static_cast<int>(r)));
    T->kfs.push_back(std::move(kf));
    while (T->kfs.size() > T->window) T->kfs.pop_front();
    T->frames_since_kf = 0;
  };

  auto write_pose = [&](const cv::Mat& R, const cv::Mat& t) {
    double q[4];
    quat_from_R(R, q);
    pose_out[0] = t.at<double>(0);
    pose_out[1] = t.at<double>(1);
    pose_out[2] = t.at<double>(2);
    pose_out[3] = q[0];
    pose_out[4] = q[1];
    pose_out[5] = q[2];
    pose_out[6] = q[3];
  };

  if (T->kfs.empty()) {  // bootstrap: first frame = origin + first keyframe
    make_kf(T->R_cur, T->t_cur);
    write_pose(T->R_cur, T->t_cur);
    *n_inliers_out = static_cast<int>(kps.size());
    return 1;
  }

  // Local map: concatenated descriptors/world points of the window.
  int total = 0;
  for (const auto& kf : T->kfs) total += kf.desc.rows;
  cv::Mat map_desc(total, desc.cols, desc.type());
  std::vector<cv::Point3f> map_pts;
  map_pts.reserve(total);
  int off = 0;
  for (const auto& kf : T->kfs) {
    kf.desc.copyTo(map_desc.rowRange(off, off + kf.desc.rows));
    map_pts.insert(map_pts.end(), kf.pts_world.begin(), kf.pts_world.end());
    off += kf.desc.rows;
  }

  std::vector<cv::DMatch> matches;
  T->matcher->match(map_desc, desc, matches);

  std::vector<cv::Point3f> obj;
  std::vector<cv::Point2f> scene;
  for (const auto& mt : matches) {
    obj.push_back(map_pts[mt.queryIdx]);
    scene.push_back(kps[mt.trainIdx].pt);
  }
  if (obj.size() < 12) {
    *n_inliers_out = 0;
    return -1;
  }

  cv::Mat K = (cv::Mat_<double>(3, 3) << T->fx, 0, T->cx, 0, T->fy, T->cy,
               0, 0, 1);
  cv::Mat rvec, tvec;
  std::vector<int> inliers;
  bool ok = cv::solvePnPRansac(obj, scene, K, cv::Mat(), rvec, tvec, false,
                               200, 3.0, 0.995, inliers,
                               cv::SOLVEPNP_EPNP);
  if (!ok || inliers.size() < 10) {
    *n_inliers_out = static_cast<int>(inliers.size());
    return -1;
  }
  {
    std::vector<cv::Point3f> obj_in;
    std::vector<cv::Point2f> scene_in;
    obj_in.reserve(inliers.size());
    scene_in.reserve(inliers.size());
    for (int idx : inliers) {
      obj_in.push_back(obj[idx]);
      scene_in.push_back(scene[idx]);
    }
    cv::solvePnPRefineLM(obj_in, scene_in, K, cv::Mat(), rvec, tvec);
  }
  cv::Mat R;
  cv::Rodrigues(rvec, R);  // world -> camera (points were world-frame)
  cv::Mat t = tvec;
  T->R_cur = R;
  T->t_cur = t;
  T->frames_since_kf++;
  write_pose(R, t);
  *n_inliers_out = static_cast<int>(inliers.size());

  // keyframe policy: displacement vs the LAST keyframe
  const auto& last = T->kfs.back();
  cv::Mat dR = R * last.R_wc.t();
  cv::Mat cam_center = -R.t() * t;
  cv::Mat last_center = -last.R_wc.t() * last.t_wc;
  double trans = cv::norm(cam_center - last_center);
  double rot = rotation_angle_deg(dR);
  double match_ratio =
      static_cast<double>(inliers.size()) /
      std::max<size_t>(1, T->kfs.back().pts_world.size());
  if (trans > T->kf_min_translation || rot > T->kf_min_rotation_deg ||
      match_ratio < T->kf_min_match_ratio) {
    make_kf(R, t);
    return 1;
  }
  return 0;
}

// Last keyframe's keypoints with valid depth: fills up to max_n entries of
// (u, v, x, y, z) float32 rows; returns the count.
int sg_tracker_keyframe_points(void* handle, float* out, int max_n) {
  auto* T = static_cast<Tracker*>(handle);
  if (T->kfs.empty()) return 0;
  const auto& kf = T->kfs.back();
  int n = 0;
  for (size_t i = 0; i < kf.px.size() && n < max_n; ++i) {
    out[n * 5 + 0] = kf.px[i].x;
    out[n * 5 + 1] = kf.px[i].y;
    out[n * 5 + 2] = kf.pts_cam[i].x;
    out[n * 5 + 3] = kf.pts_cam[i].y;
    out[n * 5 + 4] = kf.pts_cam[i].z;
    ++n;
  }
  return n;
}

void sg_tracker_destroy(void* handle) { delete static_cast<Tracker*>(handle); }

}  // extern "C"
