// Differential-test oracle shim.
//
// Compiles the *reference* simulation sources (mounted read-only at
// /root/reference/cpp, renderer excluded) into a plain-C shared library that
// the pytest harness drives via ctypes. This file is new glue code owned by
// this repo; it links against the unmodified reference translation units.
//
// Two reference quirks are handled here:
//  - Renderer is Windows-only (Renderer.h errors on !_WIN32). We compile with
//    -D_WIN32 (the header is declaration-only / PImpl, so this is safe on
//    Linux) and provide the two symbols the env TU links against.
//  - The NPC spawn RNG is an unseedable mt19937 (TrafficFlow.cpp:278,324).
//    Tests run the oracle with traffic_density=0 (spawn probability exactly 0)
//    and inject spawn decisions via env_force_spawn(), which replicates the
//    spawn semantics of TrafficFlow.cpp:240-315 using only public env state.

#include "IntersectionEnv.h"
#include "RouteGen.h"
#include "Lidar.h"
#include "Car.h"
#include "constants.h"

#include <cmath>
#include <cstring>
#include <string>
#include <vector>

// --- satisfy the renderer symbols referenced by ~IntersectionEnv -----------
struct Renderer::Impl {};
Renderer::Renderer() = default;
Renderer::~Renderer() = default;

static int status_to_int(const std::string& s) {
    if (s == "ALIVE") return 0;
    if (s == "DEAD") return 1;
    if (s == "SUCCESS") return 2;
    if (s == "CRASH_WALL") return 3;
    if (s == "CRASH_LINE") return 4;
    if (s == "CRASH_CAR") return 5;
    return -1;
}

extern "C" {

void* env_create(int num_lanes) { return new IntersectionEnv(num_lanes); }
void env_destroy(void* h) { delete static_cast<IntersectionEnv*>(h); }

void env_configure(void* h, int use_team, int respawn, int max_steps) {
    static_cast<IntersectionEnv*>(h)->configure(use_team != 0, respawn != 0, max_steps);
}

void env_configure_traffic(void* h, int enabled, float density) {
    static_cast<IntersectionEnv*>(h)->configure_traffic(enabled != 0, density);
}

void env_set_reward(void* h, float k_prog, float v_min_ms, float k_stuck, float k_cv,
                    float k_co, float k_succ, float k_sm, float alpha) {
    auto* env = static_cast<IntersectionEnv*>(h);
    env->reward_config.k_prog = k_prog;
    env->reward_config.v_min_ms = v_min_ms;
    env->reward_config.k_stuck = k_stuck;
    env->reward_config.k_cv = k_cv;
    env->reward_config.k_co = k_co;
    env->reward_config.k_succ = k_succ;
    env->reward_config.k_sm = k_sm;
    env->reward_config.alpha = alpha;
}

void env_reset(void* h) { static_cast<IntersectionEnv*>(h)->reset(); }

void env_add_car(void* h, const char* start_id, const char* end_id) {
    static_cast<IntersectionEnv*>(h)->add_car_with_route(start_id, end_id);
}

int env_num_traffic_routes(void* h) {
    return (int)static_cast<IntersectionEnv*>(h)->traffic_routes.size();
}

void env_get_traffic_route(void* h, int idx, char* start_out, char* end_out) {
    auto* env = static_cast<IntersectionEnv*>(h);
    const auto& r = env->traffic_routes.at((size_t)idx);
    std::strncpy(start_out, r.first.c_str(), 31);
    std::strncpy(end_out, r.second.c_str(), 31);
}

// Replicates try_spawn_traffic_car (TrafficFlow.cpp:240-315) with a forced
// route choice instead of the internal RNG draw. Returns 1 if spawned.
int env_force_spawn(void* h, int route_idx) {
    auto* env = static_cast<IntersectionEnv*>(h);
    if (route_idx < 0 || route_idx >= (int)env->traffic_routes.size()) return 0;
    const auto& route = env->traffic_routes[(size_t)route_idx];
    auto it = env->lane_layout.points.find(route.first);
    if (it == env->lane_layout.points.end()) return 0;
    const float sx = it->second.first;
    const float sy = it->second.second;

    const float min_dist = CAR_LENGTH * 2.5f;
    const float min_d2 = min_dist * min_dist;
    for (const auto& c : env->cars) {
        float dx = c.state.x - sx, dy = c.state.y - sy;
        if (dx * dx + dy * dy < min_d2) return 0;
    }
    for (const auto& c : env->traffic_cars) {
        float dx = c.state.x - sx, dy = c.state.y - sy;
        if (dx * dx + dy * dy < min_d2) return 0;
    }

    const int intent = determine_intent(env->lane_layout, route.first, route.second);
    auto path = generate_path_cpp(env->lane_layout, env->num_lanes, intent, route.first, route.second);
    if (path.size() < 2) return 0;

    float heading = std::atan2(-(path[1].second - path[0].second), path[1].first - path[0].first);

    Car npc;
    npc.state.x = sx;
    npc.state.y = sy;
    npc.state.v = 0.0f;
    npc.state.heading = heading;
    npc.spawn_state = npc.state;
    npc.alive = true;
    npc.intention = intent;
    npc.path = std::move(path);
    npc.path_index = 0;
    npc.prev_dist_to_goal = 0.0f;
    npc.prev_action = {0.0f, 0.0f};
    env->traffic_cars.push_back(std::move(npc));
    env->traffic_lidars.emplace_back();
    return 1;
}

// Runs one step; writes obs (n*127), rewards (n), done (n), status (n) and
// flags[3] = {terminated, truncated, agents_alive}. Returns the step count.
int env_step(void* h, const float* throttles, const float* steerings, int n, float dt,
             float* obs_out, float* rew_out, int* done_out, int* status_out,
             int* flags_out) {
    auto* env = static_cast<IntersectionEnv*>(h);
    std::vector<float> thr(throttles, throttles + n);
    std::vector<float> st(steerings, steerings + n);
    StepResult res = env->step(thr, st, dt);
    const size_t nn = res.rewards.size();
    for (size_t i = 0; i < nn; ++i) {
        rew_out[i] = res.rewards[i];
        done_out[i] = res.done[i];
        status_out[i] = status_to_int(res.status[i]);
        for (size_t k = 0; k < 127 && k < res.obs[i].size(); ++k)
            obs_out[i * 127 + k] = res.obs[i][k];
    }
    flags_out[0] = res.terminated ? 1 : 0;
    flags_out[1] = res.truncated ? 1 : 0;
    flags_out[2] = res.agents_alive;
    return res.step;
}

void env_get_obs(void* h, float* obs_out) {
    auto* env = static_cast<IntersectionEnv*>(h);
    auto obs = env->get_observations();
    for (size_t i = 0; i < obs.size(); ++i)
        for (size_t k = 0; k < 127 && k < obs[i].size(); ++k)
            obs_out[i * 127 + k] = obs[i][k];
}

int env_num_egos(void* h) { return (int)static_cast<IntersectionEnv*>(h)->cars.size(); }
int env_num_npcs(void* h) { return (int)static_cast<IntersectionEnv*>(h)->traffic_cars.size(); }

// Per-ego: x, y, v, heading, steering_angle, path_index, alive
void env_get_egos(void* h, float* out) {
    auto* env = static_cast<IntersectionEnv*>(h);
    for (size_t i = 0; i < env->cars.size(); ++i) {
        const Car& c = env->cars[i];
        out[i * 7 + 0] = c.state.x;
        out[i * 7 + 1] = c.state.y;
        out[i * 7 + 2] = c.state.v;
        out[i * 7 + 3] = c.state.heading;
        out[i * 7 + 4] = c.steering_angle;
        out[i * 7 + 5] = (float)c.path_index;
        out[i * 7 + 6] = c.alive ? 1.0f : 0.0f;
    }
}

// Per-NPC: x, y, v, heading, steering_angle, path_index, intention
void env_get_npcs(void* h, float* out) {
    auto* env = static_cast<IntersectionEnv*>(h);
    for (size_t i = 0; i < env->traffic_cars.size(); ++i) {
        const Car& c = env->traffic_cars[i];
        out[i * 7 + 0] = c.state.x;
        out[i * 7 + 1] = c.state.y;
        out[i * 7 + 2] = c.state.v;
        out[i * 7 + 3] = c.state.heading;
        out[i * 7 + 4] = c.steering_angle;
        out[i * 7 + 5] = (float)c.path_index;
        out[i * 7 + 6] = (float)c.intention;
    }
}

void env_get_lidar(void* h, int agent, float* out) {
    auto* env = static_cast<IntersectionEnv*>(h);
    const auto& d = env->lidars.at((size_t)agent).distances;
    for (size_t k = 0; k < d.size(); ++k) out[k] = d[k];
}

// ------------------------------------------------------------ kernel oracles

void oracle_gen_path(int num_lanes, const char* start_id, const char* end_id,
                     float* out, int* intent_out) {
    LaneLayout layout = build_lane_layout_cpp(num_lanes);
    int intent = determine_intent(layout, start_id, end_id);
    auto path = generate_path_cpp(layout, num_lanes, intent, start_id, end_id);
    *intent_out = intent;
    for (size_t i = 0; i < path.size(); ++i) {
        out[i * 2 + 0] = path[i].first;
        out[i * 2 + 1] = path[i].second;
    }
}

void oracle_layout_point(int num_lanes, const char* name, float* xy_out) {
    LaneLayout layout = build_lane_layout_cpp(num_lanes);
    auto it = layout.points.find(name);
    if (it == layout.points.end()) { xy_out[0] = xy_out[1] = -1.0f; return; }
    xy_out[0] = it->second.first;
    xy_out[1] = it->second.second;
}

// state: x, y, v, heading, steering_angle (updated in place); also runs
// update_path_index against the given path if path_len > 0.
void oracle_car_update(float* state, int* path_index, const float* path, int path_len,
                       float throttle, float steer, float dt) {
    Car c;
    c.state.x = state[0];
    c.state.y = state[1];
    c.state.v = state[2];
    c.state.heading = state[3];
    c.steering_angle = state[4];
    if (path_len > 0) {
        std::vector<std::pair<float, float>> p((size_t)path_len);
        for (int i = 0; i < path_len; ++i) p[(size_t)i] = {path[i * 2], path[i * 2 + 1]};
        c.path = std::move(p);
        c.path_index = *path_index;
    }
    c.update(throttle, steer, dt);
    if (path_len > 0) {
        c.update_path_index();
        *path_index = c.path_index;
    }
    state[0] = c.state.x;
    state[1] = c.state.y;
    state[2] = c.state.v;
    state[3] = c.state.heading;
    state[4] = c.steering_angle;
}

int oracle_on_road(int num_lanes, float x, float y) {
    RoadGeometry geom(num_lanes);
    return geom.is_on_road(x, y) ? 1 : 0;
}

int oracle_yellow_line(int num_lanes, float x, float y) {
    RoadGeometry geom(num_lanes);
    return geom.hits_yellow_line(x, y) ? 1 : 0;
}

int oracle_line_pixel(int num_lanes, int x, int y) {
    LineMask mask(num_lanes);
    return mask.is_line(x, y) ? 1 : 0;
}

// pose: x, y, heading
int oracle_sat(const float* pose_a, const float* pose_b) {
    Car a, b;
    a.state.x = pose_a[0]; a.state.y = pose_a[1]; a.state.heading = pose_a[2];
    b.state.x = pose_b[0]; b.state.y = pose_b[1]; b.state.heading = pose_b[2];
    return a.check_collision(b) ? 1 : 0;
}

// self pose x,y,heading; others: m rows of x,y,heading. out: 96 distances.
void oracle_lidar(int num_lanes, const float* self_pose, const float* others, int m,
                  float* out) {
    RoadGeometry geom(num_lanes);
    Car self;
    self.state.x = self_pose[0];
    self.state.y = self_pose[1];
    self.state.heading = self_pose[2];

    std::vector<Car> cars((size_t)m);
    for (int i = 0; i < m; ++i) {
        cars[(size_t)i].state.x = others[i * 3 + 0];
        cars[(size_t)i].state.y = others[i * 3 + 1];
        cars[(size_t)i].state.heading = others[i * 3 + 2];
    }

    Lidar lid;  // configure exactly like IntersectionEnv.cpp:113-127
    lid.rays = 96;
    lid.fov_deg = 360.0f;
    lid.max_dist = 250.0f;
    lid.step_size = 4.0f;
    lid.distances.assign((size_t)lid.rays, lid.max_dist);
    lid.rel_angles.clear();
    const float start_angle_deg = -lid.fov_deg * 0.5f;
    const float step_deg = lid.fov_deg / float(lid.rays - 1);
    constexpr float PI_F2 = 3.14159265358979323846f;
    for (int i = 0; i < lid.rays; ++i) {
        float deg = start_angle_deg + i * step_deg;
        lid.rel_angles.push_back(deg * PI_F2 / 180.0f);
    }
    lid.update(self, cars, geom, WIDTH, HEIGHT);
    for (int i = 0; i < lid.rays; ++i) out[i] = lid.distances[(size_t)i];
}

}  // extern "C"
