// ORCA (Optimal Reciprocal Collision Avoidance) reference oracle.
//
// A from-scratch C++ implementation of the ORCA velocity computation (van
// den Berg, Guy, Lin, Manocha: "Reciprocal n-body Collision Avoidance",
// ISRR 2009), matching the behavior of the RVO2 library's
// Agent::computeNewVelocity / linearProgram{1,2,3} that the reference
// consumes through the mit-acl Python-RVO2 fork
// (/root/reference/gym_collision_avoidance/envs/policies/RVOPolicy.py:25-96;
// the fork adds a per-agent collaboration coefficient that replaces the
// fixed 0.5 reciprocity share).  No obstacle ORCA lines: the reference
// never adds obstacles to its simulators.
//
// Used as (a) the golden oracle for the batched JAX ORCA kernel and (b) a
// host-side native fallback.  Built by utils/native_build.py; called via
// ctypes.

#include <algorithm>
#include <cmath>
#include <cstddef>
#include <utility>
#include <vector>

namespace {

constexpr double kEpsilon = 1e-5;

struct Vec2 {
  double x = 0.0, y = 0.0;
};

static inline Vec2 operator+(Vec2 a, Vec2 b) { return {a.x + b.x, a.y + b.y}; }
static inline Vec2 operator-(Vec2 a, Vec2 b) { return {a.x - b.x, a.y - b.y}; }
static inline Vec2 operator*(double s, Vec2 a) { return {s * a.x, s * a.y}; }
static inline double dot(Vec2 a, Vec2 b) { return a.x * b.x + a.y * b.y; }
static inline double det(Vec2 a, Vec2 b) { return a.x * b.y - a.y * b.x; }
static inline double absSq(Vec2 a) { return dot(a, a); }
static inline double abs2(Vec2 a) { return std::sqrt(absSq(a)); }
static inline Vec2 normalize(Vec2 a) { return (1.0 / abs2(a)) * a; }

struct Line {
  Vec2 point;
  Vec2 direction;
};

// Solve on line `lineNo` subject to lines [0, lineNo) and the disc of
// given radius.  Returns false if infeasible.
bool linearProgram1(const std::vector<Line> &lines, size_t lineNo,
                    double radius, Vec2 optVelocity, bool directionOpt,
                    Vec2 &result) {
  const double dotProduct = dot(lines[lineNo].point, lines[lineNo].direction);
  const double discriminant =
      dotProduct * dotProduct + radius * radius - absSq(lines[lineNo].point);
  if (discriminant < 0.0) return false;

  const double sqrtDiscriminant = std::sqrt(discriminant);
  double tLeft = -dotProduct - sqrtDiscriminant;
  double tRight = -dotProduct + sqrtDiscriminant;

  for (size_t i = 0; i < lineNo; ++i) {
    const double denominator = det(lines[lineNo].direction, lines[i].direction);
    const double numerator =
        det(lines[i].direction, lines[lineNo].point - lines[i].point);
    if (std::fabs(denominator) <= kEpsilon) {
      if (numerator < 0.0) return false;
      continue;
    }
    const double t = numerator / denominator;
    if (denominator >= 0.0) {
      tRight = std::min(tRight, t);
    } else {
      tLeft = std::max(tLeft, t);
    }
    if (tLeft > tRight) return false;
  }

  if (directionOpt) {
    if (dot(optVelocity, lines[lineNo].direction) > 0.0) {
      result = lines[lineNo].point + tRight * lines[lineNo].direction;
    } else {
      result = lines[lineNo].point + tLeft * lines[lineNo].direction;
    }
  } else {
    const double t =
        dot(lines[lineNo].direction, optVelocity - lines[lineNo].point);
    if (t < tLeft) {
      result = lines[lineNo].point + tLeft * lines[lineNo].direction;
    } else if (t > tRight) {
      result = lines[lineNo].point + tRight * lines[lineNo].direction;
    } else {
      result = lines[lineNo].point + t * lines[lineNo].direction;
    }
  }
  return true;
}

// Sequential constraint insertion.  Returns lines.size() on success, else
// the index of the failing line.
size_t linearProgram2(const std::vector<Line> &lines, double radius,
                      Vec2 optVelocity, bool directionOpt, Vec2 &result) {
  if (directionOpt) {
    result = radius * optVelocity;  // optVelocity is a unit vector here
  } else if (absSq(optVelocity) > radius * radius) {
    result = radius * normalize(optVelocity);
  } else {
    result = optVelocity;
  }

  for (size_t i = 0; i < lines.size(); ++i) {
    if (det(lines[i].direction, lines[i].point - result) > 0.0) {
      const Vec2 tempResult = result;
      if (!linearProgram1(lines, i, radius, optVelocity, directionOpt,
                          result)) {
        result = tempResult;
        return i;
      }
    }
  }
  return lines.size();
}

// Densest-case fallback: minimize the maximum violation.
void linearProgram3(const std::vector<Line> &lines, size_t beginLine,
                    double radius, Vec2 &result) {
  double distance = 0.0;
  for (size_t i = beginLine; i < lines.size(); ++i) {
    if (det(lines[i].direction, lines[i].point - result) > distance) {
      std::vector<Line> projLines;
      for (size_t j = 0; j < i; ++j) {
        Line line;
        const double determinant =
            det(lines[i].direction, lines[j].direction);
        if (std::fabs(determinant) <= kEpsilon) {
          if (dot(lines[i].direction, lines[j].direction) > 0.0) {
            continue;  // parallel, same direction
          }
          line.point = 0.5 * (lines[i].point + lines[j].point);
        } else {
          line.point =
              lines[i].point +
              (det(lines[j].direction, lines[i].point - lines[j].point) /
               determinant) *
                  lines[i].direction;
        }
        line.direction = normalize(lines[j].direction - lines[i].direction);
        projLines.push_back(line);
      }

      const Vec2 tempResult = result;
      if (linearProgram2(projLines, radius,
                         Vec2{-lines[i].direction.y, lines[i].direction.x},
                         true, result) < projLines.size()) {
        result = tempResult;
      }
      distance = det(lines[i].direction, lines[i].point - result);
    }
  }
}

}  // namespace

extern "C" {

// Compute ORCA velocities for all n agents from one world snapshot (the
// "doStep" velocity phase; integrate positions outside).
//
// collab_coeff is per-agent: the fork's reciprocity share (0.5 = classic
// ORCA; 0.0 = fully egoistic).
void orca_compute_velocities(
    int n, double dt, double neighbor_dist, int max_neighbors,
    double time_horizon, const double *pos, const double *vel,
    const double *pref_vel, const double *radius, const double *max_speed,
    const double *collab_coeff, double *new_vel) {
  const double invTimeHorizon = 1.0 / time_horizon;
  const double invTimeStep = 1.0 / dt;
  const double rangeSq = neighbor_dist * neighbor_dist;

  for (int i = 0; i < n; ++i) {
    const Vec2 pi{pos[2 * i], pos[2 * i + 1]};
    const Vec2 vi{vel[2 * i], vel[2 * i + 1]};

    // Nearest-first neighbor selection (replaces RVO2's k-d tree; identical
    // output set/order: up to max_neighbors within neighbor_dist, by
    // ascending distance).
    std::vector<std::pair<double, int>> neigh;
    neigh.reserve(n - 1);
    for (int j = 0; j < n; ++j) {
      if (j == i) continue;
      const Vec2 pj{pos[2 * j], pos[2 * j + 1]};
      const double dSq = absSq(pj - pi);
      if (dSq < rangeSq) neigh.emplace_back(dSq, j);
    }
    std::sort(neigh.begin(), neigh.end());
    if (static_cast<int>(neigh.size()) > max_neighbors) {
      neigh.resize(max_neighbors);
    }

    std::vector<Line> lines;
    lines.reserve(neigh.size());
    for (const auto &pr : neigh) {
      const int j = pr.second;
      const Vec2 pj{pos[2 * j], pos[2 * j + 1]};
      const Vec2 vj{vel[2 * j], vel[2 * j + 1]};

      const Vec2 relativePosition = pj - pi;
      const Vec2 relativeVelocity = vi - vj;
      const double distSq = absSq(relativePosition);
      const double combinedRadius = radius[i] + radius[j];
      const double combinedRadiusSq = combinedRadius * combinedRadius;

      Line line;
      Vec2 u;

      if (distSq > combinedRadiusSq) {
        // No collision.
        const Vec2 w = relativeVelocity - invTimeHorizon * relativePosition;
        const double wLengthSq = absSq(w);
        const double dotProduct1 = dot(w, relativePosition);

        if (dotProduct1 < 0.0 &&
            dotProduct1 * dotProduct1 > combinedRadiusSq * wLengthSq) {
          // Project on cut-off circle.
          const double wLength = std::sqrt(wLengthSq);
          const Vec2 unitW = (1.0 / wLength) * w;
          line.direction = Vec2{unitW.y, -unitW.x};
          u = (combinedRadius * invTimeHorizon - wLength) * unitW;
        } else {
          // Project on legs.
          const double leg = std::sqrt(distSq - combinedRadiusSq);
          if (det(relativePosition, w) > 0.0) {
            line.direction =
                (1.0 / distSq) *
                Vec2{relativePosition.x * leg - relativePosition.y * combinedRadius,
                     relativePosition.x * combinedRadius + relativePosition.y * leg};
          } else {
            line.direction =
                (-1.0 / distSq) *
                Vec2{relativePosition.x * leg + relativePosition.y * combinedRadius,
                     -relativePosition.x * combinedRadius + relativePosition.y * leg};
          }
          const double dotProduct2 = dot(relativeVelocity, line.direction);
          u = dotProduct2 * line.direction - relativeVelocity;
        }
      } else {
        // Already colliding: cut-off at one time step.
        const Vec2 w = relativeVelocity - invTimeStep * relativePosition;
        const double wLength = abs2(w);
        const Vec2 unitW = (1.0 / wLength) * w;
        line.direction = Vec2{unitW.y, -unitW.x};
        u = (combinedRadius * invTimeStep - wLength) * unitW;
      }

      line.point = vi + collab_coeff[i] * u;
      lines.push_back(line);
    }

    Vec2 result;
    const Vec2 prefV{pref_vel[2 * i], pref_vel[2 * i + 1]};
    const size_t lineFail =
        linearProgram2(lines, max_speed[i], prefV, false, result);
    if (lineFail < lines.size()) {
      linearProgram3(lines, lineFail, max_speed[i], result);
    }
    new_vel[2 * i] = result.x;
    new_vel[2 * i + 1] = result.y;
  }
}

}  // extern "C"
