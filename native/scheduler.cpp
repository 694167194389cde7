// Continuous-batching slot scheduler core, C++.
//
// Native runtime piece for the serving layer (new capability — the
// reference is a single-prompt script). Diffusion-native continuous
// batching: the jitted denoise step has a fixed batch shape (slots); each
// slot carries its own timestep index, so finished requests vacate their
// slot at a step boundary and queued requests join mid-flight — no
// recompile, no barrier on the longest request in the batch.
//
// This module owns the request queue + slot bookkeeping (thread-safe);
// Python owns the device loop and calls in at each step boundary.
//
// C API:
//   void* tf_sched_create(int num_slots);
//   long  tf_sched_submit(void* h, long request_id, int num_steps);
//   int   tf_sched_assign(void* h, long* out_req, int* out_slot,
//                         int* out_steps, int cap);
//   int   tf_sched_tick(void* h, long* done_req, int* done_slot, int cap);
//   int   tf_sched_active(void* h);
//   int   tf_sched_pending(void* h);
//   int   tf_sched_slot_steps_remaining(void* h, int slot);
//   void  tf_sched_destroy(void* h);

#include <cstdint>
#include <deque>
#include <mutex>
#include <vector>

namespace {

struct Request {
  long id;
  int steps;
};

struct Slot {
  bool busy = false;
  long request_id = -1;
  int remaining = 0;
};

struct Scheduler {
  std::mutex mu;
  std::deque<Request> queue;
  std::vector<Slot> slots;

  explicit Scheduler(int num_slots) : slots((size_t)num_slots) {}
};

}  // namespace

extern "C" {

void* tf_sched_create(int num_slots) {
  if (num_slots <= 0) return nullptr;
  return new Scheduler(num_slots);
}

// Enqueue a request; returns queue depth after insert (or -1 on error).
long tf_sched_submit(void* h, long request_id, int num_steps) {
  if (!h || num_steps <= 0) return -1;
  auto* s = static_cast<Scheduler*>(h);
  std::lock_guard<std::mutex> lk(s->mu);
  s->queue.push_back({request_id, num_steps});
  return (long)s->queue.size();
}

// Move queued requests into free slots. Writes up to `cap` assignments
// (request id, slot index, total steps); returns the count.
int tf_sched_assign(void* h, long* out_req, int* out_slot, int* out_steps,
                    int cap) {
  auto* s = static_cast<Scheduler*>(h);
  std::lock_guard<std::mutex> lk(s->mu);
  int n = 0;
  for (size_t i = 0; i < s->slots.size() && n < cap; ++i) {
    if (s->slots[i].busy || s->queue.empty()) continue;
    Request r = s->queue.front();
    s->queue.pop_front();
    s->slots[i] = {true, r.id, r.steps};
    out_req[n] = r.id;
    out_slot[n] = (int)i;
    out_steps[n] = r.steps;
    ++n;
  }
  return n;
}

// Advance every busy slot by one denoise step; slots reaching zero are
// freed and reported. Returns the number of completions written.
int tf_sched_tick(void* h, long* done_req, int* done_slot, int cap) {
  auto* s = static_cast<Scheduler*>(h);
  std::lock_guard<std::mutex> lk(s->mu);
  int n = 0;
  for (size_t i = 0; i < s->slots.size(); ++i) {
    Slot& sl = s->slots[i];
    if (!sl.busy) continue;
    if (--sl.remaining <= 0) {
      if (n < cap) {
        done_req[n] = sl.request_id;
        done_slot[n] = (int)i;
        ++n;
      }
      sl = Slot{};
    }
  }
  return n;
}

int tf_sched_active(void* h) {
  auto* s = static_cast<Scheduler*>(h);
  std::lock_guard<std::mutex> lk(s->mu);
  int n = 0;
  for (auto& sl : s->slots) n += sl.busy ? 1 : 0;
  return n;
}

int tf_sched_pending(void* h) {
  auto* s = static_cast<Scheduler*>(h);
  std::lock_guard<std::mutex> lk(s->mu);
  return (int)s->queue.size();
}

int tf_sched_slot_steps_remaining(void* h, int slot) {
  auto* s = static_cast<Scheduler*>(h);
  std::lock_guard<std::mutex> lk(s->mu);
  if (slot < 0 || (size_t)slot >= s->slots.size()) return -1;
  return s->slots[(size_t)slot].busy ? s->slots[(size_t)slot].remaining : 0;
}

void tf_sched_destroy(void* h) { delete static_cast<Scheduler*>(h); }

}  // extern "C"
