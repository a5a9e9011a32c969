// Native video frame reader: the decord analogue of the reference's data
// loader (reference loads video via decord.VideoReader / get_batch,
// hicom/mm_utils.py:574-644). Decodes exactly the sampled frame indices from
// a container via libav (ffmpeg), with keyframe-aware seeking, and converts
// to RGB24 with swscale. Exposed through a plain C ABI for ctypes
// (hicom_tpu/data/native_video.py); no Python headers needed.
//
// Build: make -C native   (skipped automatically when libav headers are absent)

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libswscale/swscale.h>
}

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <string>

namespace {

struct Reader {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* dec = nullptr;
  SwsContext* sws = nullptr;
  AVFrame* frame = nullptr;
  AVPacket* pkt = nullptr;
  int stream_index = -1;
  double fps = 0.0;
  int64_t n_frames = 0;
  int width = 0;
  int height = 0;
  // decode cursor: index of the NEXT frame avcodec will hand us when the
  // stream position is known; -1 after a seek until we re-sync via pts.
  int64_t next_index = 0;
  std::string error;
};

thread_local std::string g_last_error;

void set_error(Reader* r, const std::string& msg) {
  if (r) r->error = msg;
  g_last_error = msg;
}

double stream_fps(AVStream* st) {
  AVRational r = st->avg_frame_rate;
  if (r.num <= 0 || r.den <= 0) r = st->r_frame_rate;
  if (r.num <= 0 || r.den <= 0) return 25.0;
  return av_q2d(r);
}

// Map a frame index to a stream timestamp (pts units).
int64_t index_to_ts(const Reader* r, int64_t index) {
  AVStream* st = r->fmt->streams[r->stream_index];
  int64_t start = (st->start_time == AV_NOPTS_VALUE) ? 0 : st->start_time;
  return start + (int64_t)llround(index / r->fps / av_q2d(st->time_base));
}

int64_t ts_to_index(const Reader* r, int64_t ts) {
  AVStream* st = r->fmt->streams[r->stream_index];
  int64_t start = (st->start_time == AV_NOPTS_VALUE) ? 0 : st->start_time;
  return (int64_t)llround((ts - start) * av_q2d(st->time_base) * r->fps);
}

// Pull the next decoded frame into r->frame. Returns 1 on frame, 0 on EOF,
// <0 on error.
int next_frame(Reader* r) {
  while (true) {
    int ret = avcodec_receive_frame(r->dec, r->frame);
    if (ret == 0) return 1;
    if (ret == AVERROR_EOF) return 0;
    if (ret != AVERROR(EAGAIN)) return ret;
    // feed more packets
    while (true) {
      ret = av_read_frame(r->fmt, r->pkt);
      if (ret == AVERROR_EOF) {
        avcodec_send_packet(r->dec, nullptr);  // flush
        break;
      }
      if (ret < 0) return ret;
      if (r->pkt->stream_index == r->stream_index) {
        ret = avcodec_send_packet(r->dec, r->pkt);
        av_packet_unref(r->pkt);
        if (ret < 0 && ret != AVERROR(EAGAIN)) return ret;
        break;
      }
      av_packet_unref(r->pkt);
    }
  }
}

void convert_rgb(Reader* r, uint8_t* dst) {
  uint8_t* planes[4] = {dst, nullptr, nullptr, nullptr};
  int strides[4] = {3 * r->width, 0, 0, 0};
  sws_scale(r->sws, r->frame->data, r->frame->linesize, 0, r->height, planes,
            strides);
}

}  // namespace

extern "C" {

void hicom_vr_close(void* h);

const char* hicom_vr_last_error() { return g_last_error.c_str(); }

void* hicom_vr_open(const char* path) {
  Reader* r = new Reader();
  int ret = avformat_open_input(&r->fmt, path, nullptr, nullptr);
  if (ret < 0) {
    set_error(nullptr, std::string("cannot open: ") + path);
    delete r;
    return nullptr;
  }
  if (avformat_find_stream_info(r->fmt, nullptr) < 0) {
    set_error(nullptr, "no stream info");
    avformat_close_input(&r->fmt);
    delete r;
    return nullptr;
  }
  const AVCodec* codec = nullptr;
  r->stream_index =
      av_find_best_stream(r->fmt, AVMEDIA_TYPE_VIDEO, -1, -1, &codec, 0);
  if (r->stream_index < 0 || !codec) {
    set_error(nullptr, "no video stream");
    avformat_close_input(&r->fmt);
    delete r;
    return nullptr;
  }
  AVStream* st = r->fmt->streams[r->stream_index];
  r->dec = avcodec_alloc_context3(codec);
  avcodec_parameters_to_context(r->dec, st->codecpar);
  if (avcodec_open2(r->dec, codec, nullptr) < 0) {
    set_error(nullptr, "cannot open decoder");
    avcodec_free_context(&r->dec);
    avformat_close_input(&r->fmt);
    delete r;
    return nullptr;
  }
  r->fps = stream_fps(st);
  r->width = r->dec->width;
  r->height = r->dec->height;
  r->n_frames = st->nb_frames;
  if (r->n_frames <= 0) {
    int64_t dur = (st->duration != AV_NOPTS_VALUE)
                      ? (int64_t)llround(st->duration * av_q2d(st->time_base) * r->fps)
                      : 0;
    if (dur <= 0 && r->fmt->duration != AV_NOPTS_VALUE)
      dur = (int64_t)llround((double)r->fmt->duration / AV_TIME_BASE * r->fps);
    r->n_frames = dur;
  }
  r->frame = av_frame_alloc();
  r->pkt = av_packet_alloc();
  r->sws = sws_getContext(r->width, r->height, r->dec->pix_fmt, r->width,
                          r->height, AV_PIX_FMT_RGB24, SWS_BILINEAR, nullptr,
                          nullptr, nullptr);
  if (!r->sws) {
    set_error(nullptr, "cannot create RGB converter");
    hicom_vr_close(r);
    return nullptr;
  }
  return r;
}

void hicom_vr_meta(void* h, double* fps, int64_t* n_frames, int* w, int* ht) {
  Reader* r = static_cast<Reader*>(h);
  if (fps) *fps = r->fps;
  if (n_frames) *n_frames = r->n_frames;
  if (w) *w = r->width;
  if (ht) *ht = r->height;
}

// Decode the frames at `indices` (ascending, unique) into `out`
// (n * height * width * 3, RGB24 row-major). `got[i]` is set to 1 when frame
// i was decoded, 0 when the stream ended first (caller fills forward — same
// semantics as the cv2 fallback in data/video.py). Returns 0 on success,
// <0 on hard decode errors.
int hicom_vr_get_batch(void* h, const int64_t* indices, int n, uint8_t* out,
                       uint8_t* got) {
  Reader* r = static_cast<Reader*>(h);
  const int frame_bytes = 3 * r->width * r->height;
  // Seeking is worthwhile only for long jumps: one GOP is typically <=250
  // frames, and decode-forward beats seek+keyframe-redecode for short hops.
  const int64_t kSeekGap = 300;

  for (int i = 0; i < n; ++i) {
    got[i] = 0;
    int64_t target = indices[i];
    bool behind = r->next_index < 0 || r->next_index > target;
    if (behind || target - std::max<int64_t>(r->next_index, 0) > kSeekGap) {
      int64_t ts = index_to_ts(r, target);
      if (av_seek_frame(r->fmt, r->stream_index, ts, AVSEEK_FLAG_BACKWARD) >= 0) {
        avcodec_flush_buffers(r->dec);
        r->next_index = -1;  // unknown until a pts re-syncs us
      } else if (r->next_index > target) {
        // cannot seek backwards (e.g. raw streams): rewind to the start
        av_seek_frame(r->fmt, r->stream_index, 0,
                      AVSEEK_FLAG_BACKWARD | AVSEEK_FLAG_BYTE);
        avcodec_flush_buffers(r->dec);
        r->next_index = -1;
      }
    }
    while (true) {
      int ret = next_frame(r);
      if (ret == 0) return 0;  // EOF: remaining got[] stay 0
      if (ret < 0) {
        set_error(r, "decode error");
        return ret;
      }
      int64_t idx;
      int64_t ts = r->frame->best_effort_timestamp;
      if (r->next_index >= 0) {
        idx = r->next_index;  // known position: trust the frame counter
      } else if (ts != AV_NOPTS_VALUE) {
        idx = ts_to_index(r, ts);
      } else {
        idx = target;  // no pts after seek: accept (best effort)
      }
      r->next_index = idx + 1;
      if (idx >= target) {
        convert_rgb(r, out + (int64_t)i * frame_bytes);
        got[i] = 1;
        break;
      }
      av_frame_unref(r->frame);
    }
    av_frame_unref(r->frame);
  }
  return 0;
}

void hicom_vr_close(void* h) {
  Reader* r = static_cast<Reader*>(h);
  if (!r) return;
  if (r->sws) sws_freeContext(r->sws);
  if (r->frame) av_frame_free(&r->frame);
  if (r->pkt) av_packet_free(&r->pkt);
  if (r->dec) avcodec_free_context(&r->dec);
  if (r->fmt) avformat_close_input(&r->fmt);
  delete r;
}

}  // extern "C"
