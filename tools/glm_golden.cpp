// Prints golden matrices from the vendored glm for test validation.
#include <glm/glm.hpp>
#include <glm/gtc/matrix_transform.hpp>
#include <cstdio>
static void dump(const char* name, const glm::mat4& m) {
    printf("%s = [", name);
    for (int r = 0; r < 4; r++)
        for (int c = 0; c < 4; c++)
            printf("%.9g%s", m[c][r], (r==3&&c==3)?"]\n":", ");
}
int main() {
    dump("lookat", glm::lookAt(glm::vec3(-6,-0.8f,4), glm::vec3(0,0,0), glm::vec3(0,-1,0)));
    dump("persp", glm::perspective(45.f, 4.f/3.f, .1f, 100.f));
    glm::mat4 t = glm::translate(glm::mat4(), glm::vec3(0,2,0));
    glm::mat4 rt = glm::translate(glm::rotate(glm::mat4(), -90.f, glm::vec3(1,0,0)), glm::vec3(0,2,0));
    dump("rt", rt);
    glm::mat4 sc = glm::scale(glm::rotate(glm::translate(glm::mat4(), glm::vec3(1,2,3)), 30.f, glm::vec3(1,1,0)), glm::vec3(2,3,4));
    dump("trs", sc);
    // unproject of (0,0,0),(1,0,0),(0,1,0) with the test camera
    glm::mat4 view = glm::lookAt(glm::vec3(-6,-0.8f,4), glm::vec3(0,0,0), glm::vec3(0,-1,0));
    glm::mat4 proj = glm::perspective(45.f, 4.f/3.f, .1f, 100.f);
    glm::vec4 vp(0,0,1,1);
    glm::vec3 p1 = glm::unProject(glm::vec3(0.f,0.f,0.f), view, proj, vp);
    glm::vec3 p2 = glm::unProject(glm::vec3(1.f,0.f,0.f), view, proj, vp);
    glm::vec3 p3 = glm::unProject(glm::vec3(0.f,1.f,0.f), view, proj, vp);
    glm::vec3 o(glm::inverse(view) * glm::vec4(0,0,0,1));
    printf("p1 = [%.9g, %.9g, %.9g]\n", p1.x, p1.y, p1.z);
    printf("p2 = [%.9g, %.9g, %.9g]\n", p2.x, p2.y, p2.z);
    printf("p3 = [%.9g, %.9g, %.9g]\n", p3.x, p3.y, p3.z);
    printf("origin = [%.9g, %.9g, %.9g]\n", o.x, o.y, o.z);
    return 0;
}
