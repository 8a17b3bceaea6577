// sgl_kernel_npu_tpu native runtime: paged-KV page pool + radix prefix cache +
// continuous-batching scheduler.
//
// Reference parity: the reference keeps its hot host-side logic native
// (csrc/*/op_host tiling + launch, csrc/deepep adapter). On TPU, XLA owns
// kernel launch and tiling, so the native-code-worthy runtime surface is the
// serving bookkeeping that runs every scheduler tick on the host:
//   * page pool: alloc/free with refcounts (prefix sharing), the host twin of
//     the device-side alloc_extend op (csrc/alloc_extend/)
//   * radix prefix cache: token-prefix -> page mappings with LRU eviction
//     (the SGLang-style radix cache the reference's KV ops serve)
//   * scheduler: FCFS admission with a token budget per step, mixing decode
//     and chunked prefill.
//
// Exposed as a C ABI consumed via ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstring>
#include <map>
#include <memory>
#include <unordered_map>
#include <vector>

namespace {

struct RadixNode {
  std::unordered_map<int32_t, std::unique_ptr<RadixNode>> children;
  std::vector<int32_t> pages;  // one page per page_size tokens at this node
  int64_t last_access = 0;
  int32_t token_count = 0;  // tokens represented by this node (<= page_size)
  RadixNode* parent = nullptr;
  int32_t edge_token = -1;
  int refcount = 0;
};

struct PagePool {
  int32_t num_pages;
  int32_t page_size;
  std::vector<int32_t> refcount;
  std::vector<int32_t> free_list;
  int64_t clock = 0;
  RadixNode root;

  explicit PagePool(int32_t pages, int32_t psize)
      : num_pages(pages), page_size(psize), refcount(pages, 0) {
    free_list.reserve(pages);
    for (int32_t i = pages - 1; i >= 0; --i) free_list.push_back(i);
  }

  int32_t alloc() {
    if (free_list.empty()) return -1;
    int32_t p = free_list.back();
    free_list.pop_back();
    refcount[p] = 1;
    return p;
  }

  void retain(int32_t p) {
    if (p >= 0 && p < num_pages) refcount[p]++;
  }

  void release(int32_t p) {
    if (p < 0 || p >= num_pages) return;
    if (--refcount[p] == 0) free_list.push_back(p);
  }

  int32_t free_count() const { return (int32_t)free_list.size(); }
};

struct Request {
  int64_t id;
  std::vector<int32_t> tokens;     // prompt tokens
  int32_t prefilled = 0;           // tokens already processed
  int32_t decoded = 0;
  int32_t max_new_tokens = 0;
  std::vector<int32_t> pages;      // pages backing this request
  bool active = false;             // admitted
};

struct Scheduler {
  PagePool pool;
  std::map<int64_t, Request> requests;  // ordered by id = FCFS
  int32_t max_batch;
  int32_t token_budget;  // per-step prefill token budget

  Scheduler(int32_t pages, int32_t psize, int32_t mb, int32_t budget)
      : pool(pages, psize), max_batch(mb), token_budget(budget) {}
};

int64_t next_req_id = 1;

// Radix cache: walk `tokens` page-by-page; return number of cached tokens and
// append matched pages. Nodes key on the first token of each page chunk plus a
// hash of the chunk (collision-checked by storing the chunk itself).
struct ChunkNode {
  std::vector<int32_t> chunk;
  std::vector<std::unique_ptr<ChunkNode>> children;
  int32_t page = -1;
  int64_t last_access = 0;
};

struct RadixCache {
  ChunkNode root;
  int64_t clock = 0;
};

std::unordered_map<Scheduler*, std::unique_ptr<RadixCache>> g_caches;

ChunkNode* find_child(ChunkNode* n, const int32_t* chunk, int32_t len) {
  for (auto& c : n->children) {
    if ((int32_t)c->chunk.size() == len &&
        std::memcmp(c->chunk.data(), chunk, len * sizeof(int32_t)) == 0)
      return c.get();
  }
  return nullptr;
}

// Evict up to `need` least-recently-used evictable leaves (pages held ONLY by
// the cache, refcount == 1). Removing a leaf can expose its parent as the
// next candidate, so re-scan until satisfied. Returns pages freed.
int32_t evict_lru(Scheduler* s, RadixCache* cache, int32_t need) {
  int32_t freed = 0;
  while (freed < need) {
    ChunkNode* best_parent = nullptr;
    size_t best_idx = 0;
    int64_t best_t = INT64_MAX;
    std::vector<ChunkNode*> todo{&cache->root};
    while (!todo.empty()) {
      ChunkNode* n = todo.back();
      todo.pop_back();
      for (size_t i = 0; i < n->children.size(); ++i) {
        ChunkNode* c = n->children[i].get();
        if (c->children.empty()) {
          if (c->page >= 0 && c->page < s->pool.num_pages &&
              s->pool.refcount[c->page] == 1 && c->last_access < best_t) {
            best_t = c->last_access;
            best_parent = n;
            best_idx = i;
          }
        } else {
          todo.push_back(c);
        }
      }
    }
    if (!best_parent) break;
    s->pool.release(best_parent->children[best_idx]->page);
    best_parent->children.erase(best_parent->children.begin() + best_idx);
    ++freed;
  }
  return freed;
}

}  // namespace

extern "C" {

void* skt_scheduler_create(int32_t num_pages, int32_t page_size,
                           int32_t max_batch, int32_t token_budget) {
  auto* s = new Scheduler(num_pages, page_size, max_batch, token_budget);
  g_caches[s] = std::make_unique<RadixCache>();
  return s;
}

void skt_scheduler_destroy(void* h) {
  auto* s = static_cast<Scheduler*>(h);
  g_caches.erase(s);
  delete s;
}

int32_t skt_free_pages(void* h) {
  return static_cast<Scheduler*>(h)->pool.free_count();
}

// Add a request; returns its id (or -1).
int64_t skt_add_request(void* h, const int32_t* tokens, int32_t num_tokens,
                        int32_t max_new_tokens) {
  auto* s = static_cast<Scheduler*>(h);
  Request r;
  r.id = next_req_id++;
  r.tokens.assign(tokens, tokens + num_tokens);
  r.max_new_tokens = max_new_tokens;
  s->requests.emplace(r.id, std::move(r));
  return next_req_id - 1;
}

// Radix-cache lookup: number of prompt tokens whose pages are cached.
int32_t skt_match_prefix(void* h, const int32_t* tokens, int32_t num_tokens,
                         int32_t* out_pages, int32_t max_out) {
  auto* s = static_cast<Scheduler*>(h);
  auto* cache = g_caches[s].get();
  ChunkNode* n = &cache->root;
  int32_t matched = 0, count = 0;
  int32_t ps = s->pool.page_size;
  for (int32_t off = 0; off + ps <= num_tokens; off += ps) {
    ChunkNode* c = find_child(n, tokens + off, ps);
    if (!c) break;
    c->last_access = ++cache->clock;
    if (count < max_out) out_pages[count++] = c->page;
    matched += ps;
    n = c;
  }
  return matched;
}

// Insert fully-prefilled pages into the radix cache (retains them).
void skt_insert_prefix(void* h, const int32_t* tokens, int32_t num_tokens,
                       const int32_t* pages, int32_t num_pages) {
  auto* s = static_cast<Scheduler*>(h);
  auto* cache = g_caches[s].get();
  ChunkNode* n = &cache->root;
  int32_t ps = s->pool.page_size;
  int32_t pi = 0;
  for (int32_t off = 0; off + ps <= num_tokens && pi < num_pages; off += ps, ++pi) {
    ChunkNode* c = find_child(n, tokens + off, ps);
    if (!c) {
      auto child = std::make_unique<ChunkNode>();
      child->chunk.assign(tokens + off, tokens + off + ps);
      child->page = pages[pi];
      s->pool.retain(pages[pi]);
      c = child.get();
      n->children.push_back(std::move(child));
    }
    c->last_access = ++cache->clock;
    n = c;
  }
}

// Allocate `count` pages (evicting LRU cache-only pages on exhaustion).
int32_t skt_alloc_pages(void* h, int32_t count, int32_t* out) {
  auto* s = static_cast<Scheduler*>(h);
  int32_t got = 0;
  while (got < count) {
    int32_t p = s->pool.alloc();
    if (p < 0) {
      if (evict_lru(s, g_caches[s].get(), count - got) == 0) break;
      continue;
    }
    out[got++] = p;
  }
  return got;
}

// Explicit eviction (returns pages freed).
int32_t skt_evict_lru(void* h, int32_t need) {
  auto* s = static_cast<Scheduler*>(h);
  return evict_lru(s, g_caches[s].get(), need);
}

void skt_release_pages(void* h, const int32_t* pages, int32_t count) {
  auto* s = static_cast<Scheduler*>(h);
  for (int32_t i = 0; i < count; ++i) s->pool.release(pages[i]);
}

// Retain pages (prefix-cache sharing: a request pins cached pages).
void skt_retain_pages(void* h, const int32_t* pages, int32_t count) {
  auto* s = static_cast<Scheduler*>(h);
  for (int32_t i = 0; i < count; ++i) s->pool.retain(pages[i]);
}

// Build one step's batch.
// out layout per entry: [req_id_lo, req_id_hi, kind(0=prefill,1=decode),
//                        chunk_start, chunk_len]
// Returns number of entries (<= max_entries).
int32_t skt_schedule_step(void* h, int32_t* out, int32_t max_entries) {
  auto* s = static_cast<Scheduler*>(h);
  int32_t entries = 0;
  int32_t budget = s->token_budget;

  // decode first: every active, fully-prefilled, unfinished request
  for (auto& [id, r] : s->requests) {
    if (entries >= max_entries || entries >= s->max_batch) break;
    if (!r.active || r.prefilled < (int32_t)r.tokens.size()) continue;
    if (r.decoded >= r.max_new_tokens) continue;
    out[entries * 5 + 0] = (int32_t)(id & 0xffffffff);
    out[entries * 5 + 1] = (int32_t)(id >> 32);
    out[entries * 5 + 2] = 1;
    out[entries * 5 + 3] = (int32_t)r.tokens.size() + r.decoded;
    out[entries * 5 + 4] = 1;
    entries++;
    budget -= 1;
  }
  // then chunked prefill with the remaining budget
  for (auto& [id, r] : s->requests) {
    if (entries >= max_entries || entries >= s->max_batch || budget <= 0) break;
    int32_t remaining = (int32_t)r.tokens.size() - r.prefilled;
    if (remaining <= 0) continue;
    if (!r.active) {
      // admission: need pages for the full prompt eventually; require one
      // page of headroom to admit.
      if (s->pool.free_count() < 1) continue;
      r.active = true;
    }
    int32_t chunk = remaining < budget ? remaining : budget;
    out[entries * 5 + 0] = (int32_t)(id & 0xffffffff);
    out[entries * 5 + 1] = (int32_t)(id >> 32);
    out[entries * 5 + 2] = 0;
    out[entries * 5 + 3] = r.prefilled;
    out[entries * 5 + 4] = chunk;
    entries++;
    budget -= chunk;
  }
  return entries;
}

// Record progress after a step.
void skt_commit_progress(void* h, int64_t req_id, int32_t kind, int32_t count) {
  auto* s = static_cast<Scheduler*>(h);
  auto it = s->requests.find(req_id);
  if (it == s->requests.end()) return;
  if (kind == 0) it->second.prefilled += count;
  else it->second.decoded += count;
}

// Mark a request active (admitted) without going through prefill admission —
// used when resuming a preempted request whose KV was restored from host.
void skt_activate_request(void* h, int64_t req_id) {
  auto* s = static_cast<Scheduler*>(h);
  auto it = s->requests.find(req_id);
  if (it != s->requests.end()) it->second.active = true;
}

// Finish + release a request's pages.
void skt_finish_request(void* h, int64_t req_id) {
  auto* s = static_cast<Scheduler*>(h);
  auto it = s->requests.find(req_id);
  if (it == s->requests.end()) return;
  for (int32_t p : it->second.pages) s->pool.release(p);
  s->requests.erase(it);
}

int32_t skt_num_requests(void* h) {
  return (int32_t)static_cast<Scheduler*>(h)->requests.size();
}

}  // extern "C"
