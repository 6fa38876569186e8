// Generic oracle entry for the reference renderer: the whole scene comes
// from the config file's inline geometry/material grammar
// (PPMGenerator::processKeyword / readObject), plus ONE hard-coded
// emissive quad loaded from ../model/oracle_light.obj — following the
// reference's own pattern of setting emission in the mains (the config
// grammar cannot express emissive materials, main_cornellBox.cpp:31-38).
// This makes config-only scenes (MICROFACET_T, textures, bump maps)
// renderable through the reference without writing a main per scene.
#include "../include/PPMGenerator.hpp"
#include "../include/Sphere.hpp"
#include "../include/Scene.hpp"
#include "../include/Object.hpp"
#include "../include/Renderer.hpp"
#include "../include/OBJ_Loader.h"

int main(int argc, char* argv[]) {
    if (argc < 2) {
        std::cout << "usage: ref_oracle <config.txt>\n";
        return 1;
    }
    PPMGenerator g(argv[1]);

    Material lightMtl;
    lightMtl.diffuse = { 0.9f, 0.9f, 0.9f };
    lightMtl.emission = { 10.f, 10.f, 10.f };
    objl::Loader light;
    if (light.LoadFile("../model/oracle_light.obj")) {
        g.loadObj(light, lightMtl, -1, -1);
    } else {
        std::cout << "oracle_light.obj missing\n";
        return 1;
    }

    Renderer r(&g);
    r.render();
    g.generate();
    return 0;
}
