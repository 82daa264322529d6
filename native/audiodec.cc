// Native audio decoding for the feature pipeline (ctypes; audiodec.py).
//
// The reference loads mp3 preview clips via librosa/torchaudio
// (generate_node_features.py:60-77); neither is in this image, so clip
// ingestion rides the system FFmpeg libraries directly: demux ANY
// container (mp3/ogg/flac/m4a/wav), decode the first audio stream, and
// swresample to mono float32 at the caller's rate — one C call per clip,
// no Python in the loop.  An mp3 ENCODER entry point (libmp3lame through
// libavcodec) exists so tests can synthesize real mp3 vectors offline.
//
// API (all return negative AVERROR-style codes on failure):
//   ad_decode(path, target_sr, &out)  -> n_samples; caller ad_free(out)
//   ad_encode_mp3(path, samples, n, sr, bitrate) -> 0
//   ad_version() -> libavcodec version int (probe for availability)

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/channel_layout.h>
#include <libavutil/opt.h>
#include <libswresample/swresample.h>
}

namespace {

struct DecodeCtx {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* dec = nullptr;
  SwrContext* swr = nullptr;
  AVPacket* pkt = nullptr;
  AVFrame* frame = nullptr;
  ~DecodeCtx() {
    if (swr) swr_free(&swr);
    if (dec) avcodec_free_context(&dec);
    if (fmt) avformat_close_input(&fmt);
    if (pkt) av_packet_free(&pkt);
    if (frame) av_frame_free(&frame);
  }
};

// drain swr into `out` (converts + resamples one frame, or flushes when
// in == nullptr)
int64_t swr_push(SwrContext* swr, const AVFrame* in, int target_sr,
                 std::vector<float>* out) {
  const uint8_t** in_data =
      in ? const_cast<const uint8_t**>(in->extended_data) : nullptr;
  int in_n = in ? in->nb_samples : 0;
  int64_t cap = swr_get_out_samples(swr, in_n);
  if (cap <= 0) cap = in_n > 0 ? in_n * 4 + 256 : 4096;
  (void)target_sr;
  size_t old = out->size();
  out->resize(old + static_cast<size_t>(cap));
  uint8_t* out_plane = reinterpret_cast<uint8_t*>(out->data() + old);
  int got = swr_convert(swr, &out_plane, static_cast<int>(cap),
                        in_data, in_n);
  if (got < 0) {
    out->resize(old);
    return got;
  }
  out->resize(old + static_cast<size_t>(got));
  return got;
}

}  // namespace

namespace {
// decoder warnings (e.g. mp3 skipped-sample timestamp notes) are noise for
// batch feature extraction; keep real errors
struct QuietLogs {
  QuietLogs() { av_log_set_level(AV_LOG_ERROR); }
} quiet_logs;
}  // namespace

extern "C" {

int ad_version() { return LIBAVCODEC_VERSION_INT; }

void ad_free(float* p) { std::free(p); }

// Decode the first audio stream of `path` to mono float32 at `target_sr`.
// On success returns the sample count and mallocs *out (free via ad_free);
// on failure returns a negative code and leaves *out untouched.
int64_t ad_decode(const char* path, int target_sr, float** out) {
  DecodeCtx c;
  int err = avformat_open_input(&c.fmt, path, nullptr, nullptr);
  if (err < 0) return err;
  err = avformat_find_stream_info(c.fmt, nullptr);
  if (err < 0) return err;
  const AVCodec* codec = nullptr;
  int stream = av_find_best_stream(c.fmt, AVMEDIA_TYPE_AUDIO, -1, -1,
                                   &codec, 0);
  if (stream < 0) return stream;
  c.dec = avcodec_alloc_context3(codec);
  if (!c.dec) return AVERROR(ENOMEM);
  err = avcodec_parameters_to_context(c.dec, c.fmt->streams[stream]->codecpar);
  if (err < 0) return err;
  err = avcodec_open2(c.dec, codec, nullptr);
  if (err < 0) return err;
  if (c.dec->ch_layout.nb_channels <= 0 || c.dec->sample_rate <= 0)
    return AVERROR(EINVAL);

  AVChannelLayout mono = AV_CHANNEL_LAYOUT_MONO;
  err = swr_alloc_set_opts2(&c.swr, &mono, AV_SAMPLE_FMT_FLT, target_sr,
                            &c.dec->ch_layout, c.dec->sample_fmt,
                            c.dec->sample_rate, 0, nullptr);
  if (err < 0) return err;
  err = swr_init(c.swr);
  if (err < 0) return err;

  c.pkt = av_packet_alloc();
  c.frame = av_frame_alloc();
  if (!c.pkt || !c.frame) return AVERROR(ENOMEM);

  std::vector<float> samples;
  bool eof = false;
  while (!eof) {
    err = av_read_frame(c.fmt, c.pkt);
    if (err == AVERROR_EOF) {
      eof = true;
    } else if (err < 0) {
      return err;
    } else if (c.pkt->stream_index != stream) {
      av_packet_unref(c.pkt);
      continue;
    }
    err = avcodec_send_packet(c.dec, eof ? nullptr : c.pkt);
    av_packet_unref(c.pkt);
    if (err < 0 && err != AVERROR_EOF) return err;
    while (true) {
      err = avcodec_receive_frame(c.dec, c.frame);
      if (err == AVERROR(EAGAIN) || err == AVERROR_EOF) break;
      if (err < 0) return err;
      int64_t got = swr_push(c.swr, c.frame, target_sr, &samples);
      av_frame_unref(c.frame);
      if (got < 0) return got;
    }
  }
  // flush the resampler's internal FIFO
  while (true) {
    int64_t got = swr_push(c.swr, nullptr, target_sr, &samples);
    if (got < 0) return got;
    if (got == 0) break;
  }

  float* buf = static_cast<float*>(
      std::malloc(samples.size() * sizeof(float)));
  if (!buf) return AVERROR(ENOMEM);
  std::memcpy(buf, samples.data(), samples.size() * sizeof(float));
  *out = buf;
  return static_cast<int64_t>(samples.size());
}

// Encode mono float32 samples at `sr` into an .mp3 file (libmp3lame via
// libavcodec).  Test-vector utility, not a production path.
int64_t ad_encode_mp3(const char* path, const float* samples, int64_t n,
                      int sr, int bitrate) {
  const AVCodec* codec = avcodec_find_encoder_by_name("libmp3lame");
  if (!codec) codec = avcodec_find_encoder(AV_CODEC_ID_MP3);
  if (!codec) return AVERROR_ENCODER_NOT_FOUND;

  AVFormatContext* fmt = nullptr;
  int err = avformat_alloc_output_context2(&fmt, nullptr, "mp3", path);
  if (err < 0) return err;
  AVCodecContext* enc = avcodec_alloc_context3(codec);
  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  int64_t ret = 0;
  AVStream* st = nullptr;
  int64_t pos = 0;
  bool opened_io = false, header = false;

  auto fail = [&](int64_t code) { ret = code; return true; };
  do {
    if (!enc || !pkt || !frame) { fail(AVERROR(ENOMEM)); break; }
    enc->sample_rate = sr;
    enc->sample_fmt = AV_SAMPLE_FMT_FLTP;
    enc->bit_rate = bitrate > 0 ? bitrate : 128000;
    AVChannelLayout mono = AV_CHANNEL_LAYOUT_MONO;
    av_channel_layout_copy(&enc->ch_layout, &mono);
    enc->time_base = AVRational{1, sr};
    if ((err = avcodec_open2(enc, codec, nullptr)) < 0) { fail(err); break; }

    st = avformat_new_stream(fmt, nullptr);
    if (!st) { fail(AVERROR(ENOMEM)); break; }
    if ((err = avcodec_parameters_from_context(st->codecpar, enc)) < 0) {
      fail(err); break;
    }
    st->time_base = enc->time_base;
    if ((err = avio_open(&fmt->pb, path, AVIO_FLAG_WRITE)) < 0) {
      fail(err); break;
    }
    opened_io = true;
    if ((err = avformat_write_header(fmt, nullptr)) < 0) { fail(err); break; }
    header = true;

    const int frame_n = enc->frame_size > 0 ? enc->frame_size : 1152;
    bool flushed = false;
    while (!flushed && ret == 0) {
      AVFrame* send = nullptr;
      if (pos < n) {
        int this_n = static_cast<int>(n - pos < frame_n ? n - pos : frame_n);
        frame->nb_samples = this_n;
        frame->format = AV_SAMPLE_FMT_FLTP;
        av_channel_layout_copy(&frame->ch_layout, &enc->ch_layout);
        frame->sample_rate = sr;
        if ((err = av_frame_get_buffer(frame, 0)) < 0) { fail(err); break; }
        std::memcpy(frame->data[0], samples + pos,
                    sizeof(float) * static_cast<size_t>(this_n));
        frame->pts = pos;
        pos += this_n;
        send = frame;
      } else {
        flushed = true;  // send nullptr once to flush
      }
      if ((err = avcodec_send_frame(enc, send)) < 0) { fail(err); break; }
      while (true) {
        err = avcodec_receive_packet(enc, pkt);
        if (err == AVERROR(EAGAIN) || err == AVERROR_EOF) break;
        if (err < 0) { fail(err); break; }
        av_packet_rescale_ts(pkt, enc->time_base, st->time_base);
        pkt->stream_index = st->index;
        err = av_interleaved_write_frame(fmt, pkt);
        if (err < 0) { fail(err); break; }
      }
      if (send) av_frame_unref(frame);
    }
  } while (false);

  if (ret == 0 && header) {
    err = av_write_trailer(fmt);
    if (err < 0) ret = err;
  }
  if (opened_io) avio_closep(&fmt->pb);
  if (enc) avcodec_free_context(&enc);
  if (pkt) av_packet_free(&pkt);
  if (frame) av_frame_free(&frame);
  if (fmt) avformat_free_context(fmt);
  return ret;
}

}  // extern "C"
