// Standalone self-test for the native components (counterpart of the
// reference's tests/conv2d.cu C harness — but with assertions, not
// printouts). Build + run: make -C native test
#include <cassert>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

extern "C" {
void* tf_bpe_create(const char* merges, long len);
int tf_bpe_encode_words(void* h, const char* words, int len, int* out, int cap);
void tf_bpe_destroy(void* h);

void* tf_sched_create(int num_slots);
long tf_sched_submit(void* h, long request_id, int num_steps);
int tf_sched_assign(void* h, long* out_req, int* out_slot, int* out_steps, int cap);
int tf_sched_tick(void* h, long* done_req, int* done_slot, int cap);
int tf_sched_active(void* h);
int tf_sched_pending(void* h);
void tf_sched_destroy(void* h);
}

static void test_bpe() {
  const char* merges = "h e\nhe l\nl o\nhel lo</w>";  // 4 merges
  void* tok = tf_bpe_create(merges, (long)strlen(merges));
  assert(tok);
  int ids[64];

  // "hel" -> merge h+e (rank 0) -> ["he", "l</w>"]: ids [512, 256+idx(l)]
  int n = tf_bpe_encode_words(tok, "hel", 3, ids, 64);
  assert(n == 2);
  assert(ids[0] == 512);                    // "he" = first merge
  assert(ids[1] >= 256 && ids[1] < 512);    // "l</w>"

  // byte fallback stays in the base id space
  n = tf_bpe_encode_words(tok, "z", 1, ids, 64);
  assert(n == 1 && ids[0] >= 256 && ids[0] < 512);  // z</w>

  // special tokens: ids follow the merge count (512 + 4 merges + 1)
  n = tf_bpe_encode_words(tok, "<|endoftext|>", 13, ids, 64);
  assert(n == 1 && ids[0] == 512 + 4 + 1);

  // multiple pre-split words arrive '\n'-joined (incl. contractions,
  // which the Python regex has already split off)
  n = tf_bpe_encode_words(tok, "hel\n's\nz", 8, ids, 64);
  assert(n >= 4);
  assert(ids[0] == 512);

  tf_bpe_destroy(tok);
  printf("bpe ok\n");
}

static void test_sched() {
  void* s = tf_sched_create(2);
  assert(s);
  assert(tf_sched_submit(s, 10, 3) == 1);
  assert(tf_sched_submit(s, 11, 1) == 2);
  assert(tf_sched_submit(s, 12, 2) == 3);

  long req[4];
  int slot[4], steps[4];
  int n = tf_sched_assign(s, req, slot, steps, 4);
  assert(n == 2 && req[0] == 10 && req[1] == 11);
  assert(tf_sched_pending(s) == 1 && tf_sched_active(s) == 2);

  long done[4];
  int dslot[4];
  n = tf_sched_tick(s, done, dslot, 4);  // 11 completes
  assert(n == 1 && done[0] == 11);
  n = tf_sched_assign(s, req, slot, steps, 4);  // 12 takes slot 1
  assert(n == 1 && req[0] == 12 && slot[0] == 1);
  n = tf_sched_tick(s, done, dslot, 4);
  assert(n == 0);
  n = tf_sched_tick(s, done, dslot, 4);  // 10 and 12 complete
  assert(n == 2);
  assert(tf_sched_active(s) == 0 && tf_sched_pending(s) == 0);
  tf_sched_destroy(s);
  printf("sched ok\n");
}

int main() {
  test_bpe();
  test_sched();
  printf("native self-test passed\n");
  return 0;
}
