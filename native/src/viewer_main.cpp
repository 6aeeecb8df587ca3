// gs_viewer: native model viewer for fitted gaussian npz files.
//
// Native counterpart of the reference's raylib viewer
// (model_viewer_main.cpp:153-268): orbit camera, depth-sorted rendering,
// FPS HUD. When built with raylib (-DGS_HAVE_RAYLIB + link raylib) it is
// fully interactive (mouse orbit, wheel zoom, R reset); without raylib it
// runs in offline mode: renders an orbit sweep to PPM/PNG-convertible
// frames and prints the FPS it achieved, so render throughput is still
// measurable on headless machines.
//
// Usage: gs_viewer model.npz [--width 960] [--height 540] [--fovy 60]
//                  [--frames 16] [--out_dir frames] [--mode 1]

#include <chrono>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <string>
#include <vector>

#include "gs/npz.h"
#include "gs/rasterizer.h"

#ifdef GS_HAVE_RAYLIB
#include <raylib.h>
#endif

namespace {

void perspective(float fovy_deg, float aspect, float znear, float zfar,
                 float* m) {
  const float f = 1.0f / std::tan(fovy_deg * 3.14159265358979f / 180.0f * 0.5f);
  std::memset(m, 0, 16 * sizeof(float));
  m[0] = f / aspect;
  m[5] = f;
  m[10] = (zfar + znear) / (znear - zfar);
  m[11] = (2.0f * zfar * znear) / (znear - zfar);
  m[14] = -1.0f;
}

void normalize3(float* v) {
  const float n = std::sqrt(v[0] * v[0] + v[1] * v[1] + v[2] * v[2]) + 1e-8f;
  v[0] /= n; v[1] /= n; v[2] /= n;
}

void cross3(const float* a, const float* b, float* out) {
  out[0] = a[1] * b[2] - a[2] * b[1];
  out[1] = a[2] * b[0] - a[0] * b[2];
  out[2] = a[0] * b[1] - a[1] * b[0];
}

void look_at(const float* eye, const float* target, const float* up,
             float* m) {
  float f[3] = {target[0] - eye[0], target[1] - eye[1], target[2] - eye[2]};
  normalize3(f);
  float u[3] = {up[0], up[1], up[2]};
  normalize3(u);
  float s[3];
  cross3(f, u, s);
  normalize3(s);
  float u2[3];
  cross3(s, f, u2);

  // rows: [s; u2; -f] composed with translation by -eye.
  std::memset(m, 0, 16 * sizeof(float));
  for (int i = 0; i < 3; ++i) {
    m[0 * 4 + i] = s[i];
    m[1 * 4 + i] = u2[i];
    m[2 * 4 + i] = -f[i];
  }
  m[0 * 4 + 3] = -(s[0] * eye[0] + s[1] * eye[1] + s[2] * eye[2]);
  m[1 * 4 + 3] = -(u2[0] * eye[0] + u2[1] * eye[1] + u2[2] * eye[2]);
  m[2 * 4 + 3] = -(-f[0] * eye[0] - f[1] * eye[1] - f[2] * eye[2]);
  m[15] = 1.0f;
}

void write_ppm(const std::string& path, const unsigned char* rgba, int w,
               int h) {
  std::ofstream out(path, std::ios::binary);
  out << "P6\n" << w << " " << h << "\n255\n";
  for (int p = 0; p < w * h; ++p) {
    out.put(static_cast<char>(rgba[p * 4 + 0]));
    out.put(static_cast<char>(rgba[p * 4 + 1]));
    out.put(static_cast<char>(rgba[p * 4 + 2]));
  }
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr,
                 "usage: %s model.npz [--width W] [--height H] [--fovy F]"
                 " [--frames N] [--out_dir D] [--mode 0|1] [--max N]\n",
                 argv[0]);
    return 1;
  }
  std::string npz_path = argv[1];
  int width = 960, height = 540, frames = 16, mode = 1;
  long max_n = 1000000;
  float fovy = 60.0f;
  std::string out_dir = "frames";
  for (int i = 2; i + 1 < argc; i += 2) {
    const std::string k = argv[i];
    if (k == "--width") width = std::atoi(argv[i + 1]);
    else if (k == "--height") height = std::atoi(argv[i + 1]);
    else if (k == "--fovy") fovy = static_cast<float>(std::atof(argv[i + 1]));
    else if (k == "--frames") frames = std::atoi(argv[i + 1]);
    else if (k == "--out_dir") out_dir = argv[i + 1];
    else if (k == "--mode") mode = std::atoi(argv[i + 1]);
    else if (k == "--max") max_n = std::atol(argv[i + 1]);
  }

  gs::NpzFile npz;
  try {
    npz = gs::load_npz(npz_path);
  } catch (const std::exception& e) {
    std::fprintf(stderr, "failed to load %s: %s\n", npz_path.c_str(), e.what());
    return 1;
  }
  for (const char* key : {"means", "scales", "colors", "opacities"}) {
    if (!npz.count(key)) {
      std::fprintf(stderr, "npz missing array '%s'\n", key);
      return 1;
    }
  }
  const auto& means = npz["means"];
  const auto& scales = npz["scales"];
  const auto& colors = npz["colors"];
  auto& opac = npz["opacities"];
  long n = static_cast<long>(means.shape[0]);
  if (means.shape.size() != 2 || means.shape[1] != 3 ||
      scales.shape != means.shape || colors.shape != means.shape ||
      opac.data.size() != static_cast<size_t>(n)) {
    std::fprintf(stderr, "npz schema mismatch (need means/scales/colors (N,3),"
                         " opacities (N,) or (N,1))\n");
    return 1;
  }
  if (n > max_n) n = max_n;
  std::printf("loaded %ld gaussians from %s\n", n, npz_path.c_str());

  float proj[16], view[16];
  perspective(fovy, static_cast<float>(width) / height, 0.01f, 100.0f, proj);
  const float background[3] = {0.02f, 0.02f, 0.02f};
  const float target[3] = {0, 0, 0};
  const float up[3] = {0, 1, 0};

  std::vector<unsigned char> rgba(static_cast<size_t>(width) * height * 4);

#ifdef GS_HAVE_RAYLIB
  // Interactive viewer: mouse-drag orbit (0.01 rad/px, pitch clamped
  // +-1.4), wheel zoom (0.9^wheel, radius [0.2, 50]), R reset, H toggles
  // the HUD — the control scheme of the reference viewer
  // (model_viewer_main.cpp:209-261), driving this rasterizer.
  {
    InitWindow(width, height, "gs_viewer");
    Image img = GenImageColor(width, height, BLACK);
    ImageFormat(&img, PIXELFORMAT_UNCOMPRESSED_R8G8B8A8);
    Texture2D tex = LoadTextureFromImage(img);

    float yaw = 0.0f, pitch = 0.2f, radius = 2.5f;
    bool show_hud = true;
    double fps_ema = 0.0;
    while (!WindowShouldClose()) {
      if (IsMouseButtonDown(MOUSE_BUTTON_LEFT)) {
        Vector2 d = GetMouseDelta();
        yaw -= d.x * 0.01f;
        pitch += d.y * 0.01f;
        pitch = std::max(-1.4f, std::min(1.4f, pitch));
      }
      radius *= std::pow(0.9f, GetMouseWheelMove());
      radius = std::max(0.2f, std::min(50.0f, radius));
      if (IsKeyPressed(KEY_R)) { yaw = 0; pitch = 0.2f; radius = 2.5f; }
      if (IsKeyPressed(KEY_H)) show_hud = !show_hud;

      const float eye[3] = {radius * std::cos(pitch) * std::sin(yaw),
                            radius * std::sin(pitch),
                            radius * std::cos(pitch) * std::cos(yaw)};
      look_at(eye, target, up, view);

      const auto t0 = std::chrono::steady_clock::now();
      gs_render_rgba8(means.data.data(), scales.data.data(),
                      colors.data.data(), opac.data.data(),
                      static_cast<int>(n), width, height, view, proj,
                      background, mode, rgba.data());
      const auto t1 = std::chrono::steady_clock::now();
      const double frame_s = std::chrono::duration<double>(t1 - t0).count();
      fps_ema = fps_ema == 0.0 ? 1.0 / frame_s
                               : 0.8 * fps_ema + 0.2 / frame_s;

      UpdateTexture(tex, rgba.data());
      BeginDrawing();
      DrawTexture(tex, 0, 0, WHITE);
      if (show_hud) {
        char hud[128];
        std::snprintf(hud, sizeof(hud), "gs_native cpu | N=%ld | %.1f FPS",
                      n, fps_ema);
        DrawText(hud, 8, 8, 18, RAYWHITE);
      }
      EndDrawing();
    }
    UnloadTexture(tex);
    UnloadImage(img);
    CloseWindow();
    return 0;
  }
#endif

  std::string mkdir_cmd = "mkdir -p " + out_dir;
  if (std::system(mkdir_cmd.c_str()) != 0) {
    std::fprintf(stderr, "cannot create %s\n", out_dir.c_str());
    return 1;
  }

  const float radius = 2.5f, pitch = 0.2f;
  double total_s = 0.0;
  for (int f = 0; f < frames; ++f) {
    const float yaw = 2.0f * 3.14159265f * f / frames;
    const float eye[3] = {radius * std::cos(pitch) * std::sin(yaw),
                          radius * std::sin(pitch),
                          radius * std::cos(pitch) * std::cos(yaw)};
    look_at(eye, target, up, view);

    const auto t0 = std::chrono::steady_clock::now();
    gs_render_rgba8(means.data.data(), scales.data.data(), colors.data.data(),
                    opac.data.data(), static_cast<int>(n), width, height, view,
                    proj, background, mode, rgba.data());
    const auto t1 = std::chrono::steady_clock::now();
    total_s += std::chrono::duration<double>(t1 - t0).count();

    char name[512];
    std::snprintf(name, sizeof(name), "%s/frame_%03d.ppm", out_dir.c_str(), f);
    write_ppm(name, rgba.data(), width, height);
  }
  std::printf("rendered %d frames at %dx%d (mode %d): %.1f FPS (render only)\n",
              frames, width, height, mode,
              frames / (total_s > 0 ? total_s : 1e-9));
  std::printf("frames written to %s/\n", out_dir.c_str());
  return 0;
}
