// Native host-side kernels for the KITTI data pipeline.
//
// The reference's generate_depth_map (kitti_utils.py:46-98) projects ~120k
// LiDAR returns per frame in numpy inside every DataLoader worker; here the
// projection + min-depth scatter is a single C++ pass (one multiply-add
// chain per point, no intermediate arrays), exposed over a C ABI for
// ctypes. Build: scripts/build_native.py (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cmath>
#include <cstring>

extern "C" {

// pts: (n, 4) float32 homogeneous lidar points (x forward).
// P:   3x4 row-major float64 projection (P_rect @ R_rect @ T_velo2cam).
// out: (height, width) float32, pre-zeroed by the caller.
// Duplicate pixels keep the minimum depth. Returns number of points kept.
int64_t project_velodyne(const float* pts, int64_t n, const double* P,
                         int32_t height, int32_t width, int32_t use_vel_depth,
                         float* out) {
    int64_t kept = 0;
    for (int64_t i = 0; i < n; ++i) {
        const float x = pts[i * 4 + 0];
        if (x < 0.0f) continue;  // behind the camera plane
        const float y = pts[i * 4 + 1];
        const float z = pts[i * 4 + 2];

        const double u_h = P[0] * x + P[1] * y + P[2] * z + P[3];
        const double v_h = P[4] * x + P[5] * y + P[6] * z + P[7];
        const double w_h = P[8] * x + P[9] * y + P[10] * z + P[11];
        if (w_h <= 0.0) continue;

        const double depth = use_vel_depth ? (double)x : w_h;
        if (depth <= 0.0) continue;

        // devkit convention: -1 so pixel centers start at 0.
        // rint (round-half-even under the default FP mode) matches the
        // numpy fallback's np.round exactly, including ties at .5.
        const int64_t col = (int64_t)std::rint(u_h / w_h) - 1;
        const int64_t row = (int64_t)std::rint(v_h / w_h) - 1;
        if (col < 0 || row < 0 || col >= width || row >= height) continue;

        float* cell = out + row * width + col;
        const float d = (float)depth;
        if (*cell == 0.0f || d < *cell) *cell = d;
        ++kept;
    }
    return kept;
}

// Box-filter 2x downsample for float32 HWC images (pyramid fallback when
// preprocessing must run on host). out dims: (h/2, w/2, c).
void box_downsample_2x(const float* in, int32_t h, int32_t w, int32_t c,
                       float* out) {
    const int32_t oh = h / 2, ow = w / 2;
    for (int32_t y = 0; y < oh; ++y) {
        for (int32_t x = 0; x < ow; ++x) {
            for (int32_t k = 0; k < c; ++k) {
                const float a = in[((2 * y) * w + 2 * x) * c + k];
                const float b = in[((2 * y) * w + 2 * x + 1) * c + k];
                const float d = in[((2 * y + 1) * w + 2 * x) * c + k];
                const float e = in[((2 * y + 1) * w + 2 * x + 1) * c + k];
                out[(y * ow + x) * c + k] = 0.25f * (a + b + d + e);
            }
        }
    }
}

}  // extern "C"
