// Native batched Overcooked oracle (both rule variants).
//
// The validation strategy needs a sequential host-side reference to diff the
// TPU simulators against (reference repo strategy: envs/overcooked_reimplement.py
// checked via scripts/overcooked_example.py --validation).  The pure-python
// oracle tops out around 10k env-steps/s, which caps differential validation
// at toy batch sizes; this C++ translation of the same rules (source of truth:
// madrona_rl_envs_playground_tpu/oracles/overcooked.py) runs millions of
// env-steps/s so the harness can diff 10k+ env batches in real time.
//
// Plain C ABI for ctypes.  One OracleBatch holds B independent games stepped
// in a loop; parallelism across games is the caller's choice (the python
// binding releases the GIL around ovc_step_batch).

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int O_NONE = 0, O_TOMATO = 1, O_ONION = 2, O_DISH = 3, O_SOUP = 4;
constexpr int A_STAY = 4, A_INTERACT = 5;
constexpr int T_AIR = 0, T_POT = 1, T_COUNTER = 2, T_ONION_SRC = 3;
constexpr int MAXI = 3;

struct Obj {
  int name = O_NONE;  // O_NONE == empty cell
  int onions = 0;
  int tomatoes = 0;
  int tick = -1;
  int recipe() const { return 4 * onions + tomatoes; }
};

struct Config {
  int variant;  // 1 or 2
  int H, W, S, P, C, K;
  int t_tomato, t_dish, t_serve;
  int r_place, r_dish, r_soup;
  int horizon;
  std::vector<int> terr;
  std::vector<int> starts;
  std::vector<int> values;  // 16
  std::vector<int> times;   // 16
};

struct Game {
  std::vector<Obj> objects;   // [S]
  std::vector<int> pos;       // [P]
  std::vector<int> orient;    // [P]
  std::vector<Obj> held;      // [P]; name==O_NONE => empty hand
  int t = 0;
};

struct OracleBatch {
  Config cfg;
  std::vector<Game> games;
};

int adj(const Config& c, int pos, int d) {
  static const int dx[6] = {0, 0, 1, -1, 0, 0};
  static const int dy[6] = {-1, 1, 0, 0, 0, 0};
  int y = pos / c.W + dy[d];
  int x = pos % c.W + dx[d];
  int p = y * c.W + x;
  p %= c.S;
  if (p < 0) p += c.S;
  return p;
}

bool cooking(const Config& c, const Obj& o) {
  return o.tick >= 0 && o.tick < c.times[o.recipe()];
}
bool ready(const Config& c, const Obj& o) {
  return o.tick >= 0 && o.tick >= c.times[o.recipe()];
}

void reset_game(const Config& c, Game& g) {
  g.objects.assign(c.S, Obj{});
  g.pos = c.starts;
  g.orient.assign(c.P, 0);
  g.held.assign(c.P, Obj{});
  g.t = 0;
}

int nonempty_pots(const Config& c, const Game& g) {
  int n = 0;
  for (int p = 0; p < c.S; ++p) {
    const Obj& o = g.objects[p];
    if (c.terr[p] == T_POT && o.name != O_NONE &&
        (o.tick >= 0 || o.onions + o.tomatoes < MAXI))
      ++n;
  }
  return n;
}

bool dish_useful(const Config& c, const Game& g, int pots) {
  if (c.P != 2) return false;
  for (int p = 0; p < c.S; ++p)
    if (g.objects[p].name == O_DISH && c.terr[p] == T_COUNTER) return false;
  int held_dishes = 0;
  for (int i = 0; i < c.P; ++i)
    if (g.held[i].name == O_DISH) ++held_dishes;
  return held_dishes < pots;
}

int step_game(const Config& c, Game& g, const int32_t* actions, bool* done_out) {
  int reward = 0;
  int pots = nonempty_pots(c, g);

  for (int i = 0; i < c.P; ++i) {
    if (actions[i] != A_INTERACT) continue;
    int f = adj(c, g.pos[i], g.orient[i]);
    int t = c.terr[f];
    Obj& h = g.held[i];
    Obj& cell = g.objects[f];
    if (t == T_COUNTER) {
      if (h.name != O_NONE && cell.name == O_NONE) {
        cell = h;
        h = Obj{};
      } else if (h.name == O_NONE && cell.name != O_NONE) {
        h = cell;
        cell = Obj{};
      }
    } else if (t == T_ONION_SRC && h.name == O_NONE) {
      h = Obj{O_ONION, 0, 0, -1};
    } else if (t == c.t_tomato && h.name == O_NONE) {
      h = Obj{O_TOMATO, 0, 0, -1};
    } else if (t == c.t_dish && h.name == O_NONE) {
      if (dish_useful(c, g, pots)) reward += c.r_dish;
      h = Obj{O_DISH, 0, 0, -1};
    } else if (t == T_POT) {
      if (h.name == O_NONE) {
        if (c.variant == 1 && cell.name == O_SOUP && !cooking(c, cell) &&
            !ready(c, cell) && cell.onions + cell.tomatoes > 0)
          cell.tick = 0;
      } else if (h.name == O_DISH && cell.name != O_NONE && ready(c, cell)) {
        h = cell;
        cell = Obj{};
        reward += c.r_soup;
      } else if (h.name == O_ONION || h.name == O_TOMATO) {
        if (cell.name == O_NONE) cell = Obj{O_SOUP, 0, 0, -1};
        if (cell.name == O_SOUP &&
            !(cell.tick >= 0 || cell.onions + cell.tomatoes == MAXI)) {
          if (h.name == O_ONION)
            ++cell.onions;
          else
            ++cell.tomatoes;
          h = Obj{};
          reward += c.r_place;
        }
        if (c.variant == 2 && cell.name == O_SOUP && !cooking(c, cell) &&
            !ready(c, cell) && cell.onions + cell.tomatoes == MAXI)
          cell.tick = 0;
      }
    } else if (t == c.t_serve && h.name != O_NONE) {
      if (h.name == O_SOUP) {
        reward += c.values[h.recipe()];
        h = Obj{};
      }
    }
  }

  // movement: all-or-nothing collision rule
  std::vector<int> prop_pos(c.P), prop_or(c.P);
  for (int i = 0; i < c.P; ++i) {
    int a = actions[i];
    if (a == A_INTERACT) {
      prop_pos[i] = g.pos[i];
      prop_or[i] = g.orient[i];
    } else {
      int tgt = adj(c, g.pos[i], a);
      prop_or[i] = (a == A_STAY) ? g.orient[i] : a;
      prop_pos[i] = (c.terr[tgt] != T_AIR) ? g.pos[i] : tgt;
    }
  }
  bool clash = false;
  for (int i = 0; i < c.P; ++i)
    for (int j = i + 1; j < c.P; ++j)
      if (prop_pos[i] == prop_pos[j] ||
          (prop_pos[i] == g.pos[j] && prop_pos[j] == g.pos[i]))
        clash = true;
  for (int i = 0; i < c.P; ++i) {
    if (!clash) g.pos[i] = prop_pos[i];
    g.orient[i] = prop_or[i];
  }

  // environment effects
  ++g.t;
  for (int p = 0; p < c.S; ++p) {
    Obj& o = g.objects[p];
    if (o.name == O_SOUP && cooking(c, o)) ++o.tick;
  }

  *done_out = g.t >= c.horizon;
  return reward;
}

// Lossless encoding: [P, W*H*C] int8 with (x, y, c) flattening, matching the
// simulator layout (overcooked_base.py::encode).
void encode_game(const Config& c, const Game& g, int8_t* out) {
  const int shift = 5 * c.P;
  std::vector<int8_t> grid(c.S * c.C, 0);
  for (int p = 0; p < c.S; ++p)
    if (c.terr[p] > T_AIR) grid[p * c.C + shift + c.terr[p] - 1] = 1;
  for (int p = 0; p < c.S; ++p) {
    const Obj& o = g.objects[p];
    if (o.name == O_NONE) continue;
    int8_t* row = &grid[p * c.C + shift];
    if (c.variant == 1) {
      if (o.name == O_SOUP) {
        if (c.terr[p] == T_POT) {
          if (o.tick < 0) {
            row[6] = (int8_t)o.onions;
            row[7] = (int8_t)o.tomatoes;
          } else {
            row[8] = (int8_t)o.onions;
            row[9] = (int8_t)o.tomatoes;
            row[10] = (int8_t)(c.times[o.recipe()] - o.tick);
            if (ready(c, o)) row[11] = 1;
          }
        } else {
          row[8] = (int8_t)o.onions;
          row[9] = (int8_t)o.tomatoes;
          row[11] = 1;
        }
      } else if (o.name == O_DISH) {
        row[12] = 1;
      } else if (o.name == O_ONION) {
        row[13] = 1;
      } else if (o.name == O_TOMATO) {
        row[14] = 1;
      }
    } else {
      if (o.name == O_SOUP) {
        if (c.terr[p] == T_POT) {
          row[5] = (int8_t)o.onions;
          row[6] = (int8_t)(o.tick > 0 ? o.tick : 0);
        } else {
          row[7] = 1;
        }
      } else if (o.name == O_DISH) {
        row[8] = 1;
      } else if (o.name == O_ONION) {
        row[9] = 1;
      }
    }
  }
  if (c.variant == 1 && c.horizon - g.t < 40)
    for (int p = 0; p < c.S; ++p) grid[p * c.C + shift + 15] = 1;

  // per-observer copies with player channels + held objects
  std::vector<int8_t> gcopy(c.S * c.C);
  for (int i = 0; i < c.P; ++i) {
    std::memcpy(gcopy.data(), grid.data(), gcopy.size());
    for (int j = 0; j < c.P; ++j) {
      int ch = (j == i) ? 0 : (j < i ? j + 1 : j);
      int8_t* row = &gcopy[g.pos[j] * c.C];
      row[ch] = 1;
      row[c.P + 4 * ch + g.orient[j]] = 1;
      const Obj& h = g.held[j];
      if (h.name == O_NONE) continue;
      int8_t* orow = row + shift;
      if (c.variant == 1) {
        if (h.name == O_SOUP) {
          orow[8] = (int8_t)h.onions;
          orow[9] = (int8_t)h.tomatoes;
          orow[11] = 1;
        } else if (h.name == O_DISH) {
          orow[12] = 1;
        } else if (h.name == O_ONION) {
          orow[13] = 1;
        } else if (h.name == O_TOMATO) {
          orow[14] = 1;
        }
      } else {
        if (h.name == O_SOUP)
          orow[7] = 1;
        else if (h.name == O_DISH)
          orow[8] = 1;
        else if (h.name == O_ONION)
          orow[9] = 1;
      }
    }
    // (y, x, c) storage -> (x, y, c) output
    int8_t* dst = out + (size_t)i * c.S * c.C;
    for (int x = 0; x < c.W; ++x)
      for (int y = 0; y < c.H; ++y)
        std::memcpy(dst + ((size_t)x * c.H + y) * c.C,
                    &gcopy[((size_t)y * c.W + x) * c.C], c.C);
  }
}

}  // namespace

extern "C" {

void* ovc_create_batch(int variant, const int32_t* terrain, int height,
                       int width, int num_players, const int32_t* start_pos,
                       int r_place, int r_dish, int r_soup,
                       const int32_t* recipe_values,
                       const int32_t* recipe_times, int horizon,
                       int batch) {
  auto* b = new OracleBatch();
  Config& c = b->cfg;
  c.variant = variant;
  c.H = height;
  c.W = width;
  c.S = height * width;
  c.P = num_players;
  c.K = variant == 1 ? 16 : 10;
  c.C = 5 * c.P + c.K;
  if (variant == 1) {
    c.t_tomato = 4;
    c.t_dish = 5;
    c.t_serve = 6;
  } else {
    c.t_tomato = 6;
    c.t_dish = 4;
    c.t_serve = 5;
  }
  c.r_place = r_place;
  c.r_dish = r_dish;
  c.r_soup = r_soup;
  c.horizon = horizon;
  c.terr.assign(terrain, terrain + c.S);
  c.starts.assign(start_pos, start_pos + c.P);
  c.values.assign(recipe_values, recipe_values + 16);
  c.times.assign(recipe_times, recipe_times + 16);
  b->games.resize(batch);
  for (auto& g : b->games) reset_game(c, g);
  return b;
}

void ovc_destroy(void* handle) { delete static_cast<OracleBatch*>(handle); }

void ovc_reset_batch(void* handle, int8_t* obs_out) {
  auto* b = static_cast<OracleBatch*>(handle);
  const Config& c = b->cfg;
  size_t per = (size_t)c.P * c.S * c.C;
  for (size_t k = 0; k < b->games.size(); ++k) {
    reset_game(c, b->games[k]);
    encode_game(c, b->games[k], obs_out + k * per);
  }
}

// actions: [batch, P] int32; obs_out: [batch, P, S*C] int8;
// rewards: [batch] int32; dones: [batch] uint8.  Auto-resets done games and
// encodes the fresh episode (matching the simulator's in-step reset).
void ovc_step_batch(void* handle, const int32_t* actions, int8_t* obs_out,
                    int32_t* rewards, uint8_t* dones) {
  auto* b = static_cast<OracleBatch*>(handle);
  const Config& c = b->cfg;
  size_t per = (size_t)c.P * c.S * c.C;
  for (size_t k = 0; k < b->games.size(); ++k) {
    bool done = false;
    rewards[k] = step_game(c, b->games[k], actions + k * c.P, &done);
    dones[k] = done ? 1 : 0;
    if (done) reset_game(c, b->games[k]);
    encode_game(c, b->games[k], obs_out + k * per);
  }
}

}  // extern "C"
