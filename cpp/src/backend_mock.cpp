// Mock backend: zero-dependency stand-in (reference cpp/src/mock_lib.cpp:
// "Mock transcription for N frames"). Used for hardware-free testing of the
// full native stack: C ABI, session shell, CLI, feature frontend.
#include "backend.h"

#include <deque>
#include <string>

namespace trt_asr {

namespace {

class MockBackend final : public Backend {
  public:
    bool init(const std::string&, std::string&) override { return true; }

    void reset_utterance() override {
        total_frames_ = 0;
        partial_sent_ = false;
        segment_++;
        events_.clear();
    }

    bool push_features(const float*, size_t frames, std::string&) override {
        total_frames_ += frames;
        if (total_frames_ >= 100 && !partial_sent_) {
            partial_sent_ = true;
            events_.push_back({0, segment_,
                               "Mock partial for " + std::to_string(total_frames_) +
                                   " frames", ""});
        }
        return true;
    }

    bool finalize(std::string&) override {
        events_.push_back({1, segment_,
                           "Mock transcription for " + std::to_string(total_frames_) +
                               " frames", ""});
        return true;
    }

    bool poll(BackendEvent& ev) override {
        if (events_.empty()) return false;
        ev = events_.front();
        events_.pop_front();
        return true;
    }

    std::string info() const override { return "backend=mock"; }
    int n_mels() const override { return 128; }

  private:
    size_t total_frames_ = 0;
    bool partial_sent_ = false;
    int segment_ = 0;
    std::deque<BackendEvent> events_;
};

}  // namespace

Backend* make_mock_backend() { return new MockBackend(); }

}  // namespace trt_asr
