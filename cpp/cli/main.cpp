// Native CLI / replay harness over the C ABI — the equivalent of the
// reference's Rust CLI (rust/cli/src/main.rs:187-543): WAV / raw-f32 PCM /
// feature replay input, --stream-sim chunked push with real-time pacing,
// per-feature normalization computed over the WHOLE utterance then applied
// per chunk, Partial/Final/Transcript stdout protocol.
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <string>
#include <thread>
#include <vector>

#include "../include/trt_asr_tpu.h"
#include "../src/logmel.h"

namespace {

bool load_wav_16k_mono(const std::string& path, std::vector<float>& out) {
    std::ifstream f(path, std::ios::binary);
    if (!f) return false;
    char riff[4], wave[4];
    uint32_t riff_size = 0;
    f.read(riff, 4);
    f.read(reinterpret_cast<char*>(&riff_size), 4);
    f.read(wave, 4);
    if (std::strncmp(riff, "RIFF", 4) != 0 || std::strncmp(wave, "WAVE", 4) != 0)
        return false;
    uint16_t fmt = 1, channels = 1, bits = 16;
    uint32_t rate = 16000;
    while (f) {
        char id[4];
        uint32_t size = 0;
        if (!f.read(id, 4) || !f.read(reinterpret_cast<char*>(&size), 4)) break;
        if (std::strncmp(id, "fmt ", 4) == 0) {
            std::vector<char> buf(size);
            f.read(buf.data(), size);
            fmt = *reinterpret_cast<uint16_t*>(&buf[0]);
            channels = *reinterpret_cast<uint16_t*>(&buf[2]);
            rate = *reinterpret_cast<uint32_t*>(&buf[4]);
            bits = *reinterpret_cast<uint16_t*>(&buf[14]);
        } else if (std::strncmp(id, "data", 4) == 0) {
            if (rate != 16000) {
                std::fprintf(stderr, "error: sample rate %u != 16000\n", rate);
                return false;
            }
            std::vector<char> buf(size);
            f.read(buf.data(), size);
            const size_t n = size / (bits / 8) / channels;
            out.resize(n);
            if (fmt == 1 && bits == 16) {
                const int16_t* p = reinterpret_cast<const int16_t*>(buf.data());
                for (size_t i = 0; i < n; ++i) {
                    double acc = 0;
                    for (int ch = 0; ch < channels; ++ch)
                        acc += p[i * channels + static_cast<size_t>(ch)] / 32768.0;
                    out[i] = static_cast<float>(acc / channels);
                }
            } else if (fmt == 3 && bits == 32) {
                const float* p = reinterpret_cast<const float*>(buf.data());
                for (size_t i = 0; i < n; ++i) out[i] = p[i * channels];
            } else {
                std::fprintf(stderr, "error: unsupported wav format %u/%u-bit\n", fmt, bits);
                return false;
            }
            return true;
        } else {
            f.seekg(size, std::ios::cur);
        }
    }
    return false;
}

void drain(ParakeetSession* s) {
    ParakeetEvent ev;
    while (parakeet_poll_event(s, &ev)) {
        if (ev.type == PARAKEET_EVENT_PARTIAL_TEXT)
            std::printf("Partial: %s\n", ev.text);
        else if (ev.type == PARAKEET_EVENT_FINAL_TEXT)
            std::printf("Final: %s\n", ev.text);
        else
            std::fprintf(stderr, "Error: %s\n", ev.error_message);
        std::fflush(stdout);
    }
}

}  // namespace

int main(int argc, char** argv) {
    std::string input, model_dir, feature_norm = "per_feature";
    double stream_sim = 0.0;
    bool raw_pcm = false, features_input = false, mock = false, no_sleep = false;
    std::string last_final;

    for (int i = 1; i < argc; ++i) {
        std::string a = argv[i];
        auto next = [&]() -> std::string { return i + 1 < argc ? argv[++i] : ""; };
        if (a == "--model-dir") model_dir = next();
        else if (a == "--stream-sim") stream_sim = std::atof(next().c_str());
        else if (a == "--raw-pcm") raw_pcm = true;
        else if (a == "--features-input") features_input = true;
        else if (a == "--feature-norm") feature_norm = next();
        else if (a == "--mock") mock = true;
        else if (a == "--no-sleep") no_sleep = true;
        else if (a[0] != '-') input = a;
        else {
            std::fprintf(stderr, "unknown flag %s\n", a.c_str());
            return 2;
        }
    }
    if (input.empty()) {
        std::fprintf(stderr,
                     "usage: trt_asr_cli <input> --model-dir DIR [--stream-sim S] "
                     "[--raw-pcm] [--features-input] [--feature-norm none|per_feature] "
                     "[--mock] [--no-sleep]\n");
        return 2;
    }

    ParakeetConfig cfg{};
    cfg.model_dir = model_dir.c_str();
    cfg.device_id = 0;
    cfg.use_fp16 = true;
    cfg.use_mock = mock;
    ParakeetSession* sess = parakeet_create_session(&cfg);
    if (!sess) {
        std::fprintf(stderr, "failed to create session\n");
        return 1;
    }
    std::fprintf(stderr, "%s\n", trt_asr_runtime_info(sess));

    trt_asr::LogMelExtractor mel;

    if (features_input) {
        std::ifstream f(input, std::ios::binary);
        std::vector<char> raw((std::istreambuf_iterator<char>(f)),
                              std::istreambuf_iterator<char>());
        const size_t frames = raw.size() / sizeof(float) / 128;
        for (size_t s0 = 0; s0 < frames; s0 += 256) {
            const size_t n = std::min<size_t>(256, frames - s0);
            trt_asr_push_features_tc(
                sess, reinterpret_cast<float*>(raw.data()) + s0 * 128, n);
            drain(sess);
        }
    } else {
        std::vector<float> audio;
        if (raw_pcm) {
            std::ifstream f(input, std::ios::binary);
            std::vector<char> raw((std::istreambuf_iterator<char>(f)),
                                  std::istreambuf_iterator<char>());
            audio.resize(raw.size() / sizeof(float));
            std::memcpy(audio.data(), raw.data(), audio.size() * sizeof(float));
        } else if (!load_wav_16k_mono(input, audio)) {
            std::fprintf(stderr, "failed to load %s\n", input.c_str());
            parakeet_destroy_session(sess);
            return 1;
        }

        // full-utterance features + stats, applied per chunk (reference
        // per_feature semantics, main.rs:398-405)
        std::vector<float> feats = mel.compute(audio.data(), audio.size());
        const int total_frames = mel.num_frames(audio.size());
        if (feature_norm == "per_feature" && total_frames > 1) {
            auto stats = trt_asr::compute_per_feature_stats(feats.data(), total_frames, 128);
            trt_asr::apply_per_feature_norm(feats.data(), total_frames, 128, stats);
        }

        if (stream_sim > 0) {
            const int frames_per_chunk =
                static_cast<int>(stream_sim * 16000) / mel.config().hop_length;
            auto t0 = std::chrono::steady_clock::now();
            int i = 0;
            for (int s0 = 0; s0 < total_frames; s0 += frames_per_chunk, ++i) {
                const int n = std::min(frames_per_chunk, total_frames - s0);
                trt_asr_push_features_tc(sess, feats.data() + static_cast<size_t>(s0) * 128,
                                         static_cast<size_t>(n));
                drain(sess);
                if (!no_sleep) {
                    auto target = t0 + std::chrono::milliseconds(
                                           static_cast<int64_t>((i + 1) * stream_sim * 1000));
                    std::this_thread::sleep_until(target);
                }
            }
        } else if (total_frames > 0) {
            trt_asr_push_features_tc(sess, feats.data(),
                                     static_cast<size_t>(total_frames));
            drain(sess);
        }
    }

    trt_asr_finalize(sess);
    ParakeetEvent ev;
    while (parakeet_poll_event(sess, &ev)) {
        if (ev.type == PARAKEET_EVENT_FINAL_TEXT) {
            std::printf("Final: %s\n", ev.text);
            last_final = ev.text;
        } else if (ev.type == PARAKEET_EVENT_PARTIAL_TEXT) {
            std::printf("Partial: %s\n", ev.text);
        } else {
            std::fprintf(stderr, "Error: %s\n", ev.error_message);
        }
    }
    std::printf("Transcript: %s\n", last_final.c_str());
    parakeet_destroy_session(sess);
    return 0;
}
