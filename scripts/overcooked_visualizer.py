"""ASCII visualizer for Overcooked rollouts
(reference: scripts/overcooked_visualizer_script.py + the JS demo renderer).

Renders one world of a random-action (or checkpoint-driven) rollout as
terminal frames decoded from the simulator state.
"""

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

TERRAIN_CHARS_V1 = {0: " ", 1: "P", 2: "X", 3: "O", 4: "T", 5: "D", 6: "S"}
TERRAIN_CHARS_V2 = {0: " ", 1: "P", 2: "X", 3: "O", 4: "D", 5: "S", 6: "T"}
OBJ_CHARS = {0: " ", 1: "t", 2: "o", 3: "d", 4: "s"}
ORIENT_ARROWS = "^v><"


def render(env, state, world: int) -> str:
    tc = TERRAIN_CHARS_V1 if env.variant == "v1" else TERRAIN_CHARS_V2
    H, W = env.height, env.width
    terr = np.asarray(env._terr).reshape(H, W)
    obj = np.asarray(state.obj_name[world]).reshape(H, W)
    tick = np.asarray(state.obj_tick[world]).reshape(H, W)
    pos = np.asarray(state.pos[world])
    orient = np.asarray(state.orient[world])
    held = np.asarray(state.held_name[world])

    grid = [[tc[terr[y, x]] for x in range(W)] for y in range(H)]
    for y in range(H):
        for x in range(W):
            if obj[y, x] > 0:
                c = OBJ_CHARS[obj[y, x]]
                if obj[y, x] == 4 and tick[y, x] >= 0:
                    c = "S" if terr[y, x] == 1 else "s"
                grid[y][x] = c
    for p in range(env.num_players):
        y, x = divmod(int(pos[p]), W)
        grid[y][x] = str(p + 1)
    lines = ["".join(row) for row in grid]
    info = " ".join(
        f"p{p + 1}:{ORIENT_ARROWS[orient[p]]}{OBJ_CHARS[held[p]].strip() or '-'}"
        for p in range(env.num_players)
    )
    return "\n".join(lines) + f"\n t={int(state.timestep[world])} {info}"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--layout", default="cramped_room")
    p.add_argument("--variant", default="v1", choices=["v1", "v2"])
    p.add_argument("--horizon", type=int, default=50)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--fps", type=float, default=0, help="0 = print all frames")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    from madrona_rl_envs_playground_tpu.core import Simulator
    from madrona_rl_envs_playground_tpu.envs import overcooked, overcooked2

    maker = overcooked.make if args.variant == "v1" else overcooked2.make
    env = maker(args.layout, horizon=args.horizon)
    sim = Simulator(env, 1)
    rs = np.random.RandomState(args.seed)
    print(render(env, sim.bstate.env_states, 0))
    for _ in range(args.steps):
        a = rs.randint(0, 6, size=(1, env.num_players)).astype(np.int32)
        sim.step(jnp.asarray(a))
        frame = render(env, sim.bstate.env_states, 0)
        if args.fps:
            print("\033[2J\033[H" + frame)
            time.sleep(1.0 / args.fps)
        else:
            print()
            print(frame)


if __name__ == "__main__":
    main()
