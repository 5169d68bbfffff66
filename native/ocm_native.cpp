// Native host-side kernels for the OCM segmentation framework.
//
// The reference inherits its host post-processing from OpenCV/skimage C++
// binaries (SURVEY.md §2b); this library is the first-party equivalent for
// the pieces that stay on the host (variable-count region analysis feeding
// query-point generation, utils.py:250-301), plus uint8 histogram/Otsu
// helpers for host-side validation:
//
//   * connected-component labeling (8-connectivity, union-find, two-pass)
//   * small-object removal
//   * binary dilation / erosion with an arbitrary structuring element
//   * region areas, centroids and bounding boxes
//   * 256-bin histogram + Otsu threshold (cv2 semantics)
//
// C ABI only — bound from Python via ctypes (native/__init__.py).

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Union-find connected components, 8-connectivity, two-pass.
// mask: H*W uint8 (nonzero = foreground); labels_out: H*W int32.
// Returns the number of components; labels are 1..n in first-encounter order
// (matching scipy.ndimage.label / skimage.measure.label ordering).
// ---------------------------------------------------------------------------

static int32_t uf_find(std::vector<int32_t>& parent, int32_t x) {
  while (parent[x] != x) {
    parent[x] = parent[parent[x]];
    x = parent[x];
  }
  return x;
}

int32_t cc_label(const uint8_t* mask, int32_t h, int32_t w, int32_t* labels_out) {
  std::vector<int32_t> parent(1, 0);  // parent[0] unused (background)
  std::vector<int32_t> raw(static_cast<size_t>(h) * w, 0);

  for (int32_t y = 0; y < h; ++y) {
    for (int32_t x = 0; x < w; ++x) {
      const size_t idx = static_cast<size_t>(y) * w + x;
      if (!mask[idx]) continue;
      // neighbors already visited in raster order: W, NW, N, NE
      int32_t neigh[4];
      int n_neigh = 0;
      if (x > 0 && raw[idx - 1]) neigh[n_neigh++] = raw[idx - 1];
      if (y > 0) {
        const size_t up = idx - w;
        if (x > 0 && raw[up - 1]) neigh[n_neigh++] = raw[up - 1];
        if (raw[up]) neigh[n_neigh++] = raw[up];
        if (x + 1 < w && raw[up + 1]) neigh[n_neigh++] = raw[up + 1];
      }
      if (n_neigh == 0) {
        const int32_t fresh = static_cast<int32_t>(parent.size());
        parent.push_back(fresh);
        raw[idx] = fresh;
      } else {
        int32_t m = uf_find(parent, neigh[0]);
        for (int i = 1; i < n_neigh; ++i) {
          const int32_t r = uf_find(parent, neigh[i]);
          if (r < m) {
            parent[m] = r;
            m = r;
          } else if (r > m) {
            parent[r] = m;
          }
        }
        raw[idx] = m;
      }
    }
  }

  // second pass: compress + renumber in first-encounter order
  std::vector<int32_t> remap(parent.size(), 0);
  int32_t next = 0;
  for (size_t idx = 0; idx < raw.size(); ++idx) {
    if (!raw[idx]) {
      labels_out[idx] = 0;
      continue;
    }
    const int32_t root = uf_find(parent, raw[idx]);
    if (!remap[root]) remap[root] = ++next;
    labels_out[idx] = remap[root];
  }
  return next;
}

// ---------------------------------------------------------------------------
// remove_small_objects: zero every 8-connected component smaller than
// min_size. Returns the number of surviving components.
// ---------------------------------------------------------------------------

int32_t remove_small_objects(const uint8_t* mask, int32_t h, int32_t w,
                             int32_t min_size, uint8_t* out) {
  std::vector<int32_t> labels(static_cast<size_t>(h) * w);
  const int32_t n = cc_label(mask, h, w, labels.data());
  std::vector<int64_t> sizes(n + 1, 0);
  for (size_t i = 0; i < labels.size(); ++i) sizes[labels[i]]++;
  int32_t kept = 0;
  std::vector<uint8_t> keep(n + 1, 0);
  for (int32_t c = 1; c <= n; ++c) {
    if (sizes[c] >= min_size) {
      keep[c] = 1;
      ++kept;
    }
  }
  for (size_t i = 0; i < labels.size(); ++i) out[i] = keep[labels[i]] ? 1 : 0;
  return kept;
}

// ---------------------------------------------------------------------------
// Binary dilation / erosion with an arbitrary (sh, sw) structuring element
// centered at (sh/2, sw/2). border: out-of-image treated as `border_value`.
// ---------------------------------------------------------------------------

static void morph(const uint8_t* mask, int32_t h, int32_t w, const uint8_t* se,
                  int32_t sh, int32_t sw, uint8_t border_value, bool dilate,
                  uint8_t* out) {
  const int32_t cy = sh / 2, cx = sw / 2;
  for (int32_t y = 0; y < h; ++y) {
    for (int32_t x = 0; x < w; ++x) {
      uint8_t acc = dilate ? 0 : 1;
      for (int32_t dy = 0; dy < sh && (dilate ? !acc : acc); ++dy) {
        for (int32_t dx = 0; dx < sw && (dilate ? !acc : acc); ++dx) {
          if (!se[dy * sw + dx]) continue;
          const int32_t yy = y + dy - cy;
          const int32_t xx = x + dx - cx;
          uint8_t v;
          if (yy < 0 || yy >= h || xx < 0 || xx >= w) {
            v = border_value;
          } else {
            v = mask[static_cast<size_t>(yy) * w + xx] ? 1 : 0;
          }
          if (dilate) {
            if (v) acc = 1;
          } else {
            if (!v) acc = 0;
          }
        }
      }
      out[static_cast<size_t>(y) * w + x] = acc;
    }
  }
}

void binary_dilation(const uint8_t* mask, int32_t h, int32_t w, const uint8_t* se,
                     int32_t sh, int32_t sw, uint8_t* out) {
  morph(mask, h, w, se, sh, sw, /*border=*/0, /*dilate=*/true, out);
}

void binary_erosion(const uint8_t* mask, int32_t h, int32_t w, const uint8_t* se,
                    int32_t sh, int32_t sw, uint8_t border_value, uint8_t* out) {
  morph(mask, h, w, se, sh, sw, border_value, /*dilate=*/false, out);
}

// ---------------------------------------------------------------------------
// Region properties: per-label pixel count, centroid (x, y) and bbox.
// areas: n int64; centroids: n*2 double (x, y); bbox: n*4 int32
// (min_row, min_col, max_row_exclusive, max_col_exclusive).
// ---------------------------------------------------------------------------

void region_props(const int32_t* labels, int32_t h, int32_t w, int32_t n,
                  int64_t* areas, double* centroids, int32_t* bbox) {
  for (int32_t c = 0; c < n; ++c) {
    areas[c] = 0;
    centroids[2 * c] = centroids[2 * c + 1] = 0.0;
    bbox[4 * c] = h;
    bbox[4 * c + 1] = w;
    bbox[4 * c + 2] = 0;
    bbox[4 * c + 3] = 0;
  }
  for (int32_t y = 0; y < h; ++y) {
    for (int32_t x = 0; x < w; ++x) {
      const int32_t lab = labels[static_cast<size_t>(y) * w + x];
      if (!lab) continue;
      const int32_t c = lab - 1;
      areas[c]++;
      centroids[2 * c] += x;
      centroids[2 * c + 1] += y;
      if (y < bbox[4 * c]) bbox[4 * c] = y;
      if (x < bbox[4 * c + 1]) bbox[4 * c + 1] = x;
      if (y + 1 > bbox[4 * c + 2]) bbox[4 * c + 2] = y + 1;
      if (x + 1 > bbox[4 * c + 3]) bbox[4 * c + 3] = x + 1;
    }
  }
  for (int32_t c = 0; c < n; ++c) {
    if (areas[c]) {
      centroids[2 * c] /= areas[c];
      centroids[2 * c + 1] /= areas[c];
    }
  }
}

// ---------------------------------------------------------------------------
// uint8 histogram + Otsu (cv2 semantics: strict-improvement argmax over
// between-class variance, vanishing classes skipped).
// ---------------------------------------------------------------------------

void histogram_u8(const uint8_t* img, int64_t n, int64_t* hist_out) {
  std::memset(hist_out, 0, 256 * sizeof(int64_t));
  for (int64_t i = 0; i < n; ++i) hist_out[img[i]]++;
}

double otsu_threshold(const uint8_t* img, int64_t n) {
  int64_t hist[256];
  histogram_u8(img, n, hist);
  const double total = static_cast<double>(n);
  double mu_total = 0.0;
  for (int i = 0; i < 256; ++i) mu_total += i * (hist[i] / total);
  const double eps = 1.1920929e-07;
  double w1 = 0.0, mu_cum = 0.0, best = -1.0;
  int best_t = 0;
  for (int t = 0; t < 256; ++t) {
    const double p = hist[t] / total;
    w1 += p;
    mu_cum += t * p;
    const double w2 = 1.0 - w1;
    if (w1 < eps || w2 < eps) continue;
    const double mu1 = mu_cum / w1;
    const double mu2 = (mu_total - mu_cum) / w2;
    const double sigma = w1 * w2 * (mu1 - mu2) * (mu1 - mu2);
    if (sigma > best) {
      best = sigma;
      best_t = t;
    }
  }
  return static_cast<double>(best_t);
}

}  // extern "C"
