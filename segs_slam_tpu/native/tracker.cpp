// Native RGB-D visual odometry frontend (ORB + PnP RANSAC).
//
// A compact C++ tracking frontend filling the architectural slot of the
// reference's ORB-SLAM3 tracking thread (reference: ORB-SLAM3/src/Tracking.cc
// — ORB features, motion-model pose tracking, keyframe decision). This is a
// from-scratch frame-to-keyframe tracker, not a port: ORB detection and
// matching (OpenCV), 3D-2D PnP RANSAC against the last keyframe's
// depth-backed keypoints, and a keyframe policy on baseline/rotation/match
// attrition. It produces the same per-keyframe payload the MappingOperation
// protocol carries (pose + keypoints + camera-local 3D).
//
// C ABI for ctypes; all matrices row-major float64/float32.

#include <cstring>
#include <memory>
#include <vector>

#include <opencv2/calib3d.hpp>
#include <opencv2/core.hpp>
#include <opencv2/features2d.hpp>
#include <opencv2/imgproc.hpp>

namespace {

struct KeyframeRef {
  std::vector<cv::KeyPoint> kps;
  cv::Mat desc;
  std::vector<cv::Point3f> pts_cam;  // camera-local 3D (z<=0 -> invalid)
  cv::Mat R_wc;                      // world-to-camera
  cv::Mat t_wc;
};

struct Tracker {
  cv::Ptr<cv::ORB> orb;
  cv::Ptr<cv::BFMatcher> matcher;
  double fx, fy, cx, cy;
  double min_depth = 0.05, max_depth = 40.0;
  // keyframe policy
  double kf_min_translation = 0.08;   // meters
  double kf_min_rotation_deg = 8.0;   // degrees
  double kf_min_match_ratio = 0.55;   // matches vs keyframe features

  KeyframeRef last_kf;
  cv::Mat R_cur, t_cur;  // world-to-camera of the latest tracked frame
  bool has_kf = false;
  int frames_since_kf = 0;
};

void backproject(const Tracker& T, const std::vector<cv::KeyPoint>& kps,
                 const float* depth, int w, int h,
                 std::vector<cv::Point3f>* out) {
  out->resize(kps.size());
  for (size_t i = 0; i < kps.size(); ++i) {
    int u = static_cast<int>(kps[i].pt.x + 0.5f);
    int v = static_cast<int>(kps[i].pt.y + 0.5f);
    float z = (u >= 0 && u < w && v >= 0 && v < h) ? depth[v * w + u] : 0.f;
    if (z > T.min_depth && z < T.max_depth) {
      (*out)[i] = cv::Point3f(static_cast<float>((kps[i].pt.x - T.cx) / T.fx * z),
                              static_cast<float>((kps[i].pt.y - T.cy) / T.fy * z),
                              z);
    } else {
      (*out)[i] = cv::Point3f(0, 0, -1);
    }
  }
}

double rotation_angle_deg(const cv::Mat& R) {
  double tr = R.at<double>(0, 0) + R.at<double>(1, 1) + R.at<double>(2, 2);
  double c = std::min(1.0, std::max(-1.0, (tr - 1.0) / 2.0));
  return std::acos(c) * 180.0 / CV_PI;
}

}  // namespace

extern "C" {

void* sg_tracker_create(double fx, double fy, double cx, double cy,
                        int n_features) {
  auto* T = new Tracker();
  T->orb = cv::ORB::create(n_features > 0 ? n_features : 1500);
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
    T->last_kf.kps = kps;
    T->last_kf.desc = desc;
    backproject(*T, kps, depth, w, h, &T->last_kf.pts_cam);
    T->last_kf.R_wc = R.clone();
    T->last_kf.t_wc = t.clone();
    T->has_kf = true;
    T->frames_since_kf = 0;
  };

  auto write_pose = [&](const cv::Mat& R, const cv::Mat& t) {
    // quaternion (w x y z) from R
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
    pose_out[0] = t.at<double>(0);
    pose_out[1] = t.at<double>(1);
    pose_out[2] = t.at<double>(2);
    pose_out[3] = qw;
    pose_out[4] = qx;
    pose_out[5] = qy;
    pose_out[6] = qz;
  };

  if (!T->has_kf) {  // bootstrap: first frame is the origin + first keyframe
    make_kf(T->R_cur, T->t_cur);
    write_pose(T->R_cur, T->t_cur);
    *n_inliers_out = static_cast<int>(kps.size());
    return 1;
  }

  std::vector<cv::DMatch> matches;
  T->matcher->match(T->last_kf.desc, desc, matches);

  std::vector<cv::Point3f> obj;
  std::vector<cv::Point2f> scene;
  for (const auto& mt : matches) {
    const auto& p3 = T->last_kf.pts_cam[mt.queryIdx];
    if (p3.z <= 0) continue;
    obj.push_back(p3);
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
  cv::Mat R_rel;
  cv::Rodrigues(rvec, R_rel);  // last-kf camera -> current camera

  // world-to-camera of current frame: T_cur = T_rel * T_kf
  cv::Mat R = R_rel * T->last_kf.R_wc;
  cv::Mat t = R_rel * T->last_kf.t_wc + tvec;
  T->R_cur = R;
  T->t_cur = t;
  T->frames_since_kf++;
  write_pose(R, t);
  *n_inliers_out = static_cast<int>(inliers.size());

  // keyframe policy
  double trans = cv::norm(tvec);
  double rot = rotation_angle_deg(R_rel);
  double match_ratio =
      static_cast<double>(inliers.size()) /
      std::max<size_t>(1, T->last_kf.kps.size());
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
  if (!T->has_kf) return 0;
  int n = 0;
  for (size_t i = 0; i < T->last_kf.kps.size() && n < max_n; ++i) {
    const auto& p3 = T->last_kf.pts_cam[i];
    if (p3.z <= 0) continue;
    out[n * 5 + 0] = T->last_kf.kps[i].pt.x;
    out[n * 5 + 1] = T->last_kf.kps[i].pt.y;
    out[n * 5 + 2] = p3.x;
    out[n * 5 + 3] = p3.y;
    out[n * 5 + 4] = p3.z;
    ++n;
  }
  return n;
}

void sg_tracker_destroy(void* handle) { delete static_cast<Tracker*>(handle); }

}  // extern "C"
