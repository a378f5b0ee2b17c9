// spectre_serve — native batching micro-server over the SpectreViT runner.
//
// Serves an exported .stw model (spectre_tpu/export) on a TCP socket with a
// minimal length-prefixed binary protocol; the deployment counterpart of the
// CLI runner (the reference ghost-ships a Rust inference crate consuming
// exported models + example images, .gitignore:24 / vit_spectre_cifar100.py:251
// — this is the serving half of that capability).
//
// Protocol (little-endian):
//   request : "SPQ2" | u32 batch | u32 C | u32 H | u32 W
//             | batch*C*H*W float32 pixels (NCHW)
//             ("SPQ1" | u32 batch | payload is accepted for compatibility,
//             framed by the server's meta — SPQ2's explicit dims let the
//             server REJECT a shape-mismatched client instead of silently
//             computing logits on misaligned pixels)
//   request : "SPQ3" | u32 batch | u32 C | u32 H | u32 W | batch*C*H*W uint8
//             (raw 0-255 pixels at 1/4 the wire bytes; scaled by 1/255
//             server-side — bit-identical to an SPQ2 client sending x/255)
//   auth    : "SPA1" | u32 len | len bytes token  (must be the FIRST frame
//             on a connection when the server has a token; server replies
//             "SPOK" on success, "SPER"+close otherwise. Accepted as a
//             no-op handshake when no token is configured, so clients can
//             authenticate unconditionally.)
//   response: "SPR1" | u32 batch | u32 num_classes | batch*classes float32
//   error   : "SPER" | u32 len | len bytes of message
// Connections are persistent: a client may send any number of requests; the
// server replies in order and closes on EOF/protocol error.
//
// Remote transport: --host binds a specific interface (default loopback).
// Binding a non-loopback address REQUIRES a shared-secret token (--token-file
// or $SPECTRE_SERVE_TOKEN — never argv, which leaks via ps) so an exposed
// port is not an open inference endpoint. The token gates access only; the
// stream itself is plaintext — for confidentiality/integrity across
// untrusted networks front it with TLS (stunnel/nginx/ssh -L or a VPC).
//
// Concurrency: one detached thread per connection reads requests and
// enqueues them on a shared DYNAMIC BATCHER — samples from concurrent
// requests are coalesced (up to --max-batch) and run through ONE fan-out
// forward pass, then demuxed back to their connections. Continuous
// batching: requests arriving while a batch computes queue up and form the
// next batch, so a lone client executes immediately (no artificial wait);
// --batch-timeout-us optionally adds a bounded coalescing window for
// burst-heavy clients (default 0 = off).
// Weights are loaded once, shared read-only.
//
// Usage:
//   spectre_serve --weights w.stw --meta meta.txt [--port 0 | --uds PATH]
//                 [--host 127.0.0.1] [--token-file PATH]
//                 [--max-batch 256] [--batch-timeout-us 2000]
// Prints "LISTENING <port>" (TCP, port 0 = ephemeral) or
// "LISTENING_UDS <path>" (unix-domain socket — skips the loopback TCP stack
// for same-host clients) on stdout once ready.

#include <arpa/inet.h>
#include <fcntl.h>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <sys/file.h>
#include <sys/socket.h>
#include <sys/stat.h>
#include <sys/un.h>
#include <unistd.h>

#include <atomic>
#include <chrono>
#include <condition_variable>
#include <csignal>
#include <cstdlib>
#include <cstring>
#include <deque>
#include <fstream>
#include <future>
#include <iostream>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include "../inference/spectre_model.h"

namespace {

bool read_full(int fd, void* buf, size_t n) {
  char* p = static_cast<char*>(buf);
  while (n > 0) {
    ssize_t r = ::read(fd, p, n);
    if (r <= 0) return false;
    p += r;
    n -= (size_t)r;
  }
  return true;
}

bool write_full(int fd, const void* buf, size_t n) {
  const char* p = static_cast<const char*>(buf);
  while (n > 0) {
    ssize_t r = ::write(fd, p, n);
    if (r <= 0) return false;
    p += r;
    n -= (size_t)r;
  }
  return true;
}

void send_error(int fd, const std::string& msg) {
  uint32_t len = (uint32_t)msg.size();
  std::string out = "SPER";
  out.append(reinterpret_cast<const char*>(&len), 4);
  out.append(msg);
  write_full(fd, out.data(), out.size());
}

// One queued inference job: a request's samples + the promise its
// connection thread waits on.
struct Job {
  std::vector<float> input;                       // batch * C*H*W
  uint32_t batch;
  std::promise<std::vector<std::vector<float>>> done;
};

// Length-independent-per-byte comparison: a byte-wise early exit would let
// a remote caller binary-search the token one byte at a time off the RTT.
bool token_equal(const std::string& a, const std::string& b) {
  unsigned char acc = (unsigned char)(a.size() ^ b.size());
  const char* bp = b.empty() ? "" : b.data();  // "" has a valid '\0' at [0]
  const size_t bn = b.empty() ? 1 : b.size();
  for (size_t i = 0; i < a.size(); ++i)
    acc |= (unsigned char)(a[i] ^ bp[i % bn]);
  return acc == 0;
}

struct Server {
  spectre::Weights weights;
  spectre::Config cfg;
  uint32_t max_batch = 256;
  int batch_timeout_us = 0;
  std::string token;  // empty = no auth required

  // dynamic batcher state
  mutable std::mutex mu;
  mutable std::condition_variable cv;
  mutable std::deque<Job*> queue;
  mutable uint32_t queued_samples = 0;

  // Coalesce queued jobs into one fan-out forward pass. Runs on a single
  // dispatcher thread: pop jobs until max_batch samples are staged or the
  // timeout since the first sample expires, run all samples over the worker
  // pool, fulfil each job's promise with its slice.
  void batcher_loop() const {
    const size_t img_elems =
        (size_t)cfg.in_channels * cfg.img_size * cfg.img_size;
    for (;;) {
      std::vector<Job*> jobs;
      uint32_t total = 0;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv.wait(lk, [&] { return !queue.empty(); });
        // batching window: wait (bounded) for more requests to coalesce
        if (batch_timeout_us > 0 && queued_samples < max_batch)
          cv.wait_for(lk, std::chrono::microseconds(batch_timeout_us),
                      [&] { return queued_samples >= max_batch; });
        while (!queue.empty() && total + queue.front()->batch <= max_batch) {
          jobs.push_back(queue.front());
          total += queue.front()->batch;
          queue.pop_front();
        }
        if (jobs.empty()) {  // single over-sized... cannot happen (guarded
          jobs.push_back(queue.front());  // at enqueue); defensive
          total = queue.front()->batch;
          queue.pop_front();
        }
        queued_samples -= total;
      }

      // flatten job inputs into one sample array (views, no copy needed —
      // per-sample pointers index into each job's buffer)
      std::vector<const float*> samples;
      samples.reserve(total);
      for (Job* j : jobs)
        for (uint32_t b = 0; b < j->batch; ++b)
          samples.push_back(j->input.data() + img_elems * b);

      std::vector<std::vector<float>> out;
      spectre::forward_batch(weights, cfg, samples, out);

      size_t off = 0;
      for (Job* j : jobs) {
        std::vector<std::vector<float>> slice(out.begin() + off,
                                              out.begin() + off + j->batch);
        off += j->batch;
        j->done.set_value(std::move(slice));
      }
    }
  }

  void handle(int fd) const {
    const size_t img_elems =
        (size_t)cfg.in_channels * cfg.img_size * cfg.img_size;
    char magic[4];
    bool first = true;
    while (read_full(fd, magic, 4)) {
      if (first) {
        first = false;
        const bool is_auth = std::strncmp(magic, "SPA1", 4) == 0;
        if (is_auth) {
          uint32_t len = 0;
          if (!read_full(fd, &len, 4) || len > 4096) break;
          std::string got(len, '\0');
          if (len && !read_full(fd, got.data(), len)) break;
          if (!token.empty() && !token_equal(got, token)) {
            send_error(fd, "auth failed");
            break;
          }
          if (!write_full(fd, "SPOK", 4)) break;
          continue;
        }
        if (!token.empty()) {
          // token configured but the first frame is not an auth frame:
          // refuse before touching the request machinery
          send_error(fd, "auth required");
          break;
        }
      }
      const bool v2 = std::strncmp(magic, "SPQ2", 4) == 0;
      // SPQ3: raw uint8 pixels (1/4 the wire bytes), scaled by 1/255 here —
      // protocol parity with the JAX backend (serving/jax_server.py)
      const bool v3 = std::strncmp(magic, "SPQ3", 4) == 0;
      if (!v2 && !v3 && std::strncmp(magic, "SPQ1", 4) != 0) {
        send_error(fd, "bad magic");
        break;
      }
      const size_t elem_bytes = v3 ? 1 : sizeof(float);
      uint32_t batch = 0;
      if (!read_full(fd, &batch, 4)) break;
      uint32_t dims[3] = {(uint32_t)cfg.in_channels, (uint32_t)cfg.img_size,
                          (uint32_t)cfg.img_size};
      if ((v2 || v3) && !read_full(fd, dims, 12)) break;
      const size_t req_elems = (size_t)dims[0] * dims[1] * dims[2];
      if (req_elems != img_elems) {
        // drain the (client-framed) payload, reject, keep the connection
        std::vector<char> sink(1 << 16);
        size_t left = elem_bytes * req_elems * batch;
        bool ok = batch <= (1u << 20);
        while (ok && left > 0) {
          size_t chunk = std::min(left, sink.size());
          ok = read_full(fd, sink.data(), chunk);
          left -= chunk;
        }
        send_error(fd, "input shape mismatch: expected " +
                           std::to_string(cfg.in_channels) + "x" +
                           std::to_string(cfg.img_size) + "x" +
                           std::to_string(cfg.img_size));
        if (!ok) break;
        continue;
      }
      if (batch == 0 || batch > max_batch) {
        // drain the request payload BEFORE replying, then keep the
        // connection alive: closing with unread data in the receive queue
        // sends RST, which can discard the queued SPER bytes and abort the
        // client's in-flight sendall
        if (batch == 0 || batch > (1u << 20)) {  // nonsensical: just error+close
          send_error(fd, "batch out of range");
          break;
        }
        std::vector<char> sink(1 << 16);
        size_t left = elem_bytes * img_elems * batch;
        bool ok = true;
        while (left > 0 && ok) {
          size_t chunk = std::min(left, sink.size());
          ok = read_full(fd, sink.data(), chunk);
          left -= chunk;
        }
        send_error(fd, "batch out of range");
        if (!ok) break;
        continue;
      }
      Job job;
      job.batch = batch;
      job.input.resize(img_elems * batch);
      if (v3) {
        std::vector<uint8_t> raw(img_elems * batch);
        if (!read_full(fd, raw.data(), raw.size())) break;
        // true division (not reciprocal-multiply): bit-identical to a
        // client computing x/255 in f32 and sending SPQ2
        for (size_t i = 0; i < raw.size(); ++i)
          job.input[i] = (float)raw[i] / 255.0f;
      } else if (!read_full(fd, job.input.data(),
                            sizeof(float) * job.input.size())) {
        break;
      }
      auto fut = job.done.get_future();
      {
        std::lock_guard<std::mutex> lk(mu);
        queue.push_back(&job);
        queued_samples += batch;
      }
      cv.notify_all();
      std::vector<std::vector<float>> per_sample = fut.get();

      const uint32_t classes = (uint32_t)per_sample[0].size();
      std::vector<char> resp(12 + sizeof(float) * (size_t)classes * batch);
      std::memcpy(resp.data(), "SPR1", 4);
      std::memcpy(resp.data() + 4, &batch, 4);
      std::memcpy(resp.data() + 8, &classes, 4);
      for (uint32_t b = 0; b < batch; ++b)
        std::memcpy(resp.data() + 12 + sizeof(float) * (size_t)classes * b,
                    per_sample[b].data(), sizeof(float) * classes);
      if (!write_full(fd, resp.data(), resp.size())) break;
    }
    ::close(fd);
  }
};

}  // namespace

int main(int argc, char** argv) {
  std::map<std::string, std::string> args;
  for (int i = 1; i + 1 < argc; i += 2) args[argv[i]] = argv[i + 1];
  if (!args.count("--weights") || !args.count("--meta")) {
    std::cerr << "usage: spectre_serve --weights w.stw --meta meta.txt "
                 "[--port P] [--max-batch B]\n";
    return 2;
  }
  ::signal(SIGPIPE, SIG_IGN);

  Server srv;
  srv.weights = spectre::load_stw(args["--weights"]);
  auto meta = spectre::load_meta(args["--meta"]);
  if (meta.count("model") && meta["model"] != "spectre_vit") {
    std::cerr << "spectre_serve implements model=spectre_vit; got "
              << meta["model"] << "\n";
    return 2;
  }
  if (meta.count("method") && meta["method"] != "permut_mix") {
    // fail at startup, not at the first request's forward() deep inside a
    // worker thread (same guard as the CLI runner)
    std::cerr << "spectre_serve implements method=permut_mix "
                 "(gather|structured); got " << meta["method"] << "\n";
    return 2;
  }
  srv.cfg = spectre::Config{
      spectre::meta_int(meta, "img_size"),
      spectre::meta_int(meta, "patch_size"),
      spectre::meta_int(meta, "in_channels"),
      spectre::meta_int(meta, "num_classes"),
      spectre::meta_int(meta, "embed_dim"),
      spectre::meta_int(meta, "num_encoders"),
      spectre::meta_int(meta, "num_heads"),
      spectre::meta_int(meta, "hidden_dim"),
      meta.count("mix_impl") ? meta["mix_impl"] : "gather"};
  if (args.count("--max-batch")) srv.max_batch = std::stoul(args["--max-batch"]);
  if (args.count("--batch-timeout-us"))
    srv.batch_timeout_us = std::stoi(args["--batch-timeout-us"]);
  if (args.count("--int8") && args["--int8"] != "0") {
#ifdef SPECTRE_HAS_INT8
    spectre::int8_mode().store(true);
    std::cerr << "int8 VNNI quantized GEMMs enabled\n";
#else
    std::cerr << "--int8 requires an AVX512-VNNI build (this binary was "
                 "compiled without it)\n";
    return 2;
#endif
  }

  // shared-secret token: --token-file wins over $SPECTRE_SERVE_TOKEN.
  // Never accepted via argv (leaks through ps/procfs).
  if (args.count("--token-file")) {
    std::ifstream tf(args["--token-file"]);
    if (!tf) {
      std::cerr << "--token-file unreadable: " << args["--token-file"] << "\n";
      return 2;
    }
    std::getline(tf, srv.token);
  } else if (const char* t = std::getenv("SPECTRE_SERVE_TOKEN")) {
    srv.token = t;
  }
  // strip a trailing CR so a CRLF token file matches a sane client
  while (!srv.token.empty() &&
         (srv.token.back() == '\r' || srv.token.back() == '\n'))
    srv.token.pop_back();
  // NOTE: the batcher thread starts only after the listener is up — an
  // early `return` from the transport guards below must not leave a
  // detached thread waiting on srv's condition variable while main's
  // destructors tear it down (measured as a hang on the error paths).

  int one = 1;
  int sock = -1;
  bool is_uds = args.count("--uds") > 0;
  if (is_uds) {
    const std::string& path = args["--uds"];
    sockaddr_un uaddr{};
    if (path.size() >= sizeof(uaddr.sun_path)) {
      std::cerr << "--uds path too long\n";
      return 2;
    }
    sock = ::socket(AF_UNIX, SOCK_STREAM, 0);
    uaddr.sun_family = AF_UNIX;
    std::strncpy(uaddr.sun_path, path.c_str(), sizeof(uaddr.sun_path) - 1);
    // Serialize the probe+unlink+bind sequence below across concurrently
    // starting servers: without it, two servers racing on the same stale
    // socket path can both pass the liveness probe, and the second's unlink
    // orphans the first's freshly bound socket (TOCTOU). A sidecar flock
    // held for the daemon's lifetime makes the sequence exclusive; the fd
    // deliberately never closes (the lock dies with the process, so a
    // killed server leaves no stale lock).
    const std::string lock_path = path + ".lock";
    int lock_fd = ::open(lock_path.c_str(), O_CREAT | O_RDWR, 0600);
    if (lock_fd < 0 || ::flock(lock_fd, LOCK_EX | LOCK_NB) != 0) {
      std::cerr << "--uds another server is starting/running on " << path
                << " (lock " << lock_path << ")\n";
      return 2;
    }
    // Only remove a STALE socket: never delete a non-socket file (a typo'd
    // --uds path must not destroy data), and never hijack a path another
    // live server is accepting on (probe with a connect; TCP gets the same
    // protection from bind()'s EADDRINUSE).
    struct stat st {};
    if (::lstat(path.c_str(), &st) == 0) {
      if (!S_ISSOCK(st.st_mode)) {
        std::cerr << "--uds path exists and is not a socket: " << path << "\n";
        return 2;
      }
      int probe = ::socket(AF_UNIX, SOCK_STREAM, 0);
      bool live = ::connect(probe, reinterpret_cast<sockaddr*>(&uaddr),
                            sizeof(uaddr)) == 0;
      ::close(probe);
      if (live) {
        std::cerr << "--uds path already has a live server: " << path << "\n";
        return 2;
      }
      ::unlink(path.c_str());  // stale socket from a dead server
    }
    if (::bind(sock, reinterpret_cast<sockaddr*>(&uaddr), sizeof(uaddr)) != 0 ||
        ::listen(sock, 64) != 0) {
      std::cerr << "uds bind/listen failed: " << path << "\n";
      return 1;
    }
    std::cout << "LISTENING_UDS " << path << std::endl;
  } else {
    int port = args.count("--port") ? std::stoi(args["--port"]) : 0;
    const std::string host =
        args.count("--host") ? args["--host"] : "127.0.0.1";
    sockaddr_in addr{};
    addr.sin_family = AF_INET;
    if (::inet_pton(AF_INET, host.c_str(), &addr.sin_addr) != 1) {
      std::cerr << "--host is not a valid IPv4 address: " << host << "\n";
      return 2;
    }
    if (addr.sin_addr.s_addr != htonl(INADDR_LOOPBACK) && srv.token.empty()) {
      std::cerr << "--host " << host << " is not loopback: a remote-reachable "
                   "endpoint requires a token (--token-file or "
                   "$SPECTRE_SERVE_TOKEN); see the transport notes in this "
                   "file's header for the TLS stance\n";
      return 2;
    }
    sock = ::socket(AF_INET, SOCK_STREAM, 0);
    ::setsockopt(sock, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
    addr.sin_port = htons((uint16_t)port);
    if (::bind(sock, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) != 0 ||
        ::listen(sock, 64) != 0) {
      std::cerr << "bind/listen failed\n";
      return 1;
    }
    socklen_t alen = sizeof(addr);
    ::getsockname(sock, reinterpret_cast<sockaddr*>(&addr), &alen);
    std::cout << "LISTENING " << ntohs(addr.sin_port) << std::endl;
  }

  std::thread([&srv]() { srv.batcher_loop(); }).detach();

  for (;;) {
    int fd = ::accept(sock, nullptr, nullptr);
    if (fd < 0) continue;
    if (!is_uds)
      ::setsockopt(fd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));
    std::thread([&srv, fd]() { srv.handle(fd); }).detach();
  }
}
